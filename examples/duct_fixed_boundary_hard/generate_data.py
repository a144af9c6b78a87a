"""duct_fixed_boundary_hard data generation (reference
examples/duct_fixed_boundary_hard/generate_data.py). Requires Blender (bpy)
for the boolean-union mesh composition."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from examples.duct_fixed_boundary_hard.generator_2d_fixed import \
    Generator2DFixedHard
from porous_cfd_tpu.datagen.generator import build_arg_parser


def run():
    args = build_arg_parser().parse_args()
    assets = Path(__file__).resolve().parent / "assets"
    gen = Generator2DFixedHard(str(assets), args.openfoam_dir,
                               args.openfoam_procs, meta_only=args.meta_only)
    gen.generate(args.data_root_dir)


if __name__ == "__main__":
    run()
