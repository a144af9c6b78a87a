"""Vertical-duct dataset (reference
examples/vertical_duct_fixed_boundary/vertical_duct_dataset.py): the second
top inlet's one-hot id is merged into the main inlet id so models trained on
the single-inlet schema can be fine-tuned."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from porous_cfd_tpu.data.dataset import FoamDataset


class VerticalDuctDataset(FoamDataset):
    def add_features(self, internal, patches):
        super().add_features(internal, patches)
        if "inlet-top" not in self._boundary_names:
            return
        names = self._boundary_names
        i_top = names.index("inlet-top")
        i_in = names.index("inlet")
        keep = [i for i in range(len(names)) if i != i_top]
        for table in [internal, *patches.values()]:
            bid = table["boundaryId"]
            bid[:, i_in] = bid[:, i_in] + bid[:, i_top]
            table["boundaryId"] = bid[:, keep]
        self._boundary_names = [n for n in names if n != "inlet-top"]
