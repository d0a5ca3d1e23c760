from .jsonl import read_jsonl, write_jsonl  # noqa: F401
from .warc import (  # noqa: F401
    read_warc, read_wet, synth_warc, write_warc, write_wet,
)
