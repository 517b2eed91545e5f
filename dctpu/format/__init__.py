"""DCF1 frame format: canonical host-side serializer (docs/FORMAT.md)."""

from dctpu.format.frame import (  # noqa: F401
    BlockHeaders,
    Frame,
    StreamMeta,
    plan_blocks,
    read_frame,
    write_frame,
)
from dctpu.format.raw import read_raw, write_raw  # noqa: F401
