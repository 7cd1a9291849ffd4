from pointnerf2studio_tpu.models.mvsnet.mvsnet import (
    MVSNetParams, load_mvsnet_params, mvsnet_depth)
from pointnerf2studio_tpu.models.mvsnet.featurenet import (
    FPNParams, load_fpn_params, fpn_features, premlp_embed)
