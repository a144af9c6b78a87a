from porous_cfd_tpu.physics.operators import pinn_derivatives, split_derivatives
from porous_cfd_tpu.physics import losses
