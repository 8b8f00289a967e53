from kmer_id_tpu.parallel.mesh import make_mesh  # noqa: F401
from kmer_id_tpu.parallel.sharded import ShardedClassifier  # noqa: F401
from kmer_id_tpu.parallel.fpsharded import ShardedFpClassifier  # noqa: F401
