"""Shared test fixtures — re-exported from the package's synthetic data module."""
from porous_cfd_tpu.data.synthetic import (FOAM_LABELS, N_COLS,  # noqa: F401
                                           VARIABLE_BOUNDARIES,
                                           make_foam_batch, make_scalers)
