from kmer_id_tpu.engine.classify import Classifier  # noqa: F401
