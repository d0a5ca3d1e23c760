from .warc import read_warc, synth_warc, write_warc  # noqa: F401
