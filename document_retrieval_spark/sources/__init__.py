from .tables import read_transcripts, write_table  # noqa: F401
