"""duct_fixed_boundary_hard evaluate — same pipeline as duct_fixed_boundary
(reference examples/duct_fixed_boundary_hard/evaluate.py)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from examples.duct_fixed_boundary.evaluate import run

if __name__ == "__main__":
    run()
