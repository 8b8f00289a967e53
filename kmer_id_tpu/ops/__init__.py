from kmer_id_tpu.ops.extract import extract_kmers  # noqa: F401
from kmer_id_tpu.ops.lookup import searchsorted2, lookup_keys  # noqa: F401
from kmer_id_tpu.ops.fold import msca_jnp, lca_jnp, fold_targets  # noqa: F401
