from genmmrec_tpu.common.losses import bpr_loss, emb_loss, l2_loss, infonce
from genmmrec_tpu.common.init import xavier_normal, xavier_uniform, normal_init
