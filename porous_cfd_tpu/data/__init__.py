from porous_cfd_tpu.data.foam_data import FoamData
from porous_cfd_tpu.data.scalers import StandardScaler, Normalizer
