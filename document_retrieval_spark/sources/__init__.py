from .snapshots import SnapshotTable, is_snapshot_table  # noqa: F401
from .tables import read_transcripts, write_table  # noqa: F401
