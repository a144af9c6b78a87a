from porous_cfd_tpu.models.base import PinnModel
from porous_cfd_tpu.models.mlp import MLP, PointNetFeatureExtract
