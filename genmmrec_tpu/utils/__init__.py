from genmmrec_tpu.utils.misc import (
    get_local_time,
    init_seed,
    early_stopping,
    dict2str,
)
from genmmrec_tpu.utils.logger import init_logger
