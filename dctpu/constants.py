"""Frozen DCF1 format constants. Normative source: docs/FORMAT.md."""

MAGIC = b"DCF1"
VERSION = 1

RAW_MAGIC = b"DCR1"

# Codeword (docs/FORMAT.md §2)
ESCAPE_Q = 16          # q >= ESCAPE_Q -> escape code
RAW_BITS = 32          # escape payload bits
MAX_CODE_BITS = ESCAPE_Q + RAW_BITS  # 48
K_MAX = 24             # encoder k search bound (decoder accepts k <= 30)

# Predictor ids (docs/FORMAT.md §3)
DELTA = 0
DOUBLE_DELTA = 1
LPC = 2

HISTORY_LEN = 4        # history samples carried per block header
LPC_SHIFT = 16         # Q16 fixed-point coefficient shift
LPC_MAX_ORDER = 4

BLOCK_LEN_DEFAULT = 4096

# Struct sizes (bytes)
FILE_HEADER_BYTES = 64
STREAM_DIR_BYTES = 32
BLOCK_HEADER_BYTES = 32
TABLE_ENTRY_BYTES = 20
TRAILER_BYTES = 20
