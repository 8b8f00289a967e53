from kmer_id_tpu.report.rollup import (  # noqa: F401
    readbatch_10,
    readbatch_c3,
    m3_report,
    readc_report,
)
