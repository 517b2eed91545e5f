"""Frozen DCF1 format constants. Normative source: docs/FORMAT.md."""

MAGIC = b"DCF1"
VERSION = 2  # v2: VERTICAL sync entry gained the (e-1)<<11 field; exception
# values may be bit-planed (FORMAT §2.2). v1 vertical frames would silently
# mis-decode (ADVICE r2), so readers reject them loudly.

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

# Coder ids (docs/FORMAT.md §2.2)
CODER_RICE = 0
CODER_VERTICAL = 1
EXC_CAP = 16  # normative max exceptions per sub-block (FORMAT §2.2)

HISTORY_LEN = 4        # history samples carried per block header
LPC_SHIFT = 16         # Q16 fixed-point coefficient shift
LPC_MAX_ORDER = 4

BLOCK_LEN_DEFAULT = 4096

# Sub-block sync framing (docs/FORMAT.md §2.1): every block's payload starts
# with per-128-sample code bit-lengths so decode parallelizes within blocks.
SUB_BLOCK = 128


def subs_per_block(block_len: int) -> int:
    return (block_len + SUB_BLOCK - 1) // SUB_BLOCK


def sync_words(block_len: int) -> int:
    """u32 words occupied by the sync table at the start of each payload."""
    return (subs_per_block(block_len) + 1) // 2


def sub_caps(block_len: int):
    """Sample count per sub-block index (last sub may be short)."""
    subs = subs_per_block(block_len)
    return [
        min(SUB_BLOCK, block_len - s * SUB_BLOCK) for s in range(subs)
    ]

# Struct sizes (bytes)
FILE_HEADER_BYTES = 64
STREAM_DIR_BYTES = 32
BLOCK_HEADER_BYTES = 32
TABLE_ENTRY_BYTES = 20
TRAILER_BYTES = 20
