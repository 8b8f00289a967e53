from kmer_id_tpu.db.probes import (  # noqa: F401
    ProbeRecords,
    PackedDB,
    parse_probes_text,
    pack_probes,
    write_probes_text,
)
from kmer_id_tpu.db.metadata import load_data_txt, load_tree_edges  # noqa: F401
