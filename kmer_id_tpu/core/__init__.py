from kmer_id_tpu.core.codec import (  # noqa: F401
    KSIZE,
    KEY_BITS,
    encode_bases,
    encode_bases_u,
    canonical_kmers,
    forward_kmers,
    key_to_string,
    string_to_key,
    split_key,
    join_key,
    revcomp_key,
)
from kmer_id_tpu.core.taxonomy import Taxonomy  # noqa: F401
from kmer_id_tpu.core.trim import trim_batch  # noqa: F401
