"""Stage runner (reference run_singularity.py:9-15): imports
``examples.<EXPERIMENT>.<RUNCMD>`` and calls its ``run()`` after chdir'ing into
the experiment directory, so relative ``data/`` and ``lightning_logs/`` paths
match the reference layout.

Usage:  EXPERIMENT=duct_fixed_boundary RUNCMD=train python run_experiment.py [args...]
"""
import importlib
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent
sys.path.insert(0, str(ROOT))


def main():
    experiment = os.environ["EXPERIMENT"]
    runcmd = os.environ["RUNCMD"]
    module = importlib.import_module(f"examples.{experiment}.{runcmd}")
    os.chdir(ROOT / "examples" / experiment)
    module.run()


if __name__ == "__main__":
    main()
