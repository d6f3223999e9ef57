from sqe_tpu.utils.logging import get_logger  # noqa: F401
from sqe_tpu.utils.metrics import Metrics, StageTimer  # noqa: F401
