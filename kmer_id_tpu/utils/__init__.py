from kmer_id_tpu.utils.logging import log, set_verbosity  # noqa: F401
from kmer_id_tpu.utils.timing import Timer, StageTimers  # noqa: F401
