"""abc data generation (reference examples/abc/generate_data.py): ABC chunk
download + mesh filtering (see data_preprocess.py) then case generation."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

from examples.abc.abc_generator import AbcGenerator
from porous_cfd_tpu.datagen.generator import build_arg_parser


def run():
    args = build_arg_parser().parse_args()
    assets = Path(__file__).resolve().parent / "assets"
    gen = AbcGenerator(str(assets), args.openfoam_dir, args.openfoam_procs,
                       meta_only=args.meta_only)
    gen.generate(args.data_root_dir)


if __name__ == "__main__":
    run()
