"""duct_variable_boundary data generation (reference
examples/duct_variable_boundary/generate_data.py): mesh augmentation + case
instantiation with variable BCs, then OpenFOAM runs (requires the OpenFOAM
toolchain in PATH via the shell wrapper)."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from examples.duct_variable_boundary.generator_2d_variable import \
    Generator2DVariable
from porous_cfd_tpu.datagen.generator import build_arg_parser


def run():
    args = build_arg_parser().parse_args()
    assets = Path(__file__).resolve().parent / "assets"
    gen = Generator2DVariable(str(assets), args.openfoam_dir,
                              args.openfoam_procs, meta_only=args.meta_only)
    gen.generate(args.data_root_dir)


if __name__ == "__main__":
    run()
