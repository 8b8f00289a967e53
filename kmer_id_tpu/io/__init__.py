from kmer_id_tpu.io.fastx import (  # noqa: F401
    iter_fastq_gz,
    iter_fastq_plain,
    iter_fasta_gz,
    iter_fasta_plain,
    iter_reads_auto,
    load_genome_gz,
    load_genome_contigs,
)
from kmer_id_tpu.io.batch import ReadBatcher  # noqa: F401
