"""One-shot porter for the OpenFOAM case-template solver configs.

The reference ships complete snappyHexMesh/simpleFoam case templates
(controlDict/fvSchemes/fvSolution/0/p/blockMeshDict/... per experiment);
these are solver configuration — the numeric schemes and boundary setups ARE
the ground-truth contract, so their content is preserved exactly. This script
copies any template file missing from our examples, reformatted to this
repo's template style: OpenFOAM banner/separator/footer comments stripped
from dicts, Run/Clean shell scripts condensed to the one-line log_output
idiom already used by the checked-in Run scripts.

Run once from the repo root: python tools/port_templates.py
"""
from __future__ import annotations

import re
import stat
from pathlib import Path

REF = Path("/root/reference/examples")
MINE = Path(__file__).resolve().parents[1] / "examples"

BANNER = re.compile(r"/\*-+\*- C\+\+ -\*-+\*\\\n(?:\|.*\n)*\\\*-+\*/\n", re.M)
SEPARATOR = re.compile(r"^// \*.*//\s*$\n?", re.M)


def port_dict(text: str) -> str:
    text = BANNER.sub("", text)
    text = SEPARATOR.sub("", text)
    return text.rstrip() + "\n"


def port_shell(text: str) -> str:
    # match the condensed style of the existing Run scripts
    text = re.sub(r"^export PV_PLUGIN_PATH=.*\n", "", text, flags=re.M)
    text = re.sub(r"[ \t]+#.*$", "", text, flags=re.M)  # trailing comments
    text = text.replace(
        "log_output(){\n  if [ $1 != 0 ]; then\n  echo \"$2\">\"./log.txt\";\n"
        "  exit  1;\nfi\n}",
        'log_output(){ if [ $1 != 0 ]; then echo "$2">"./log.txt"; exit 1; fi }')
    # join `out=$(...)` with its following log_output line
    text = re.sub(r"^(out=\$\(.*\))\n+log_output \$\? \"\$out\"",
                  r'\1; log_output $? "$out"', text, flags=re.M)
    text = re.sub(r"\n{3,}", "\n\n", text)
    return text.rstrip() + "\n"


def main() -> None:
    added = 0
    for ref in sorted(REF.glob("*/assets/openfoam-case-template/**/*")):
        if not ref.is_file():
            continue
        dst = MINE / ref.relative_to(REF)
        if dst.exists():
            continue
        text = ref.read_text()
        is_shell = ref.name in ("Run", "Clean")
        dst.parent.mkdir(parents=True, exist_ok=True)
        dst.write_text(port_shell(text) if is_shell else port_dict(text))
        if is_shell:
            dst.chmod(dst.stat().st_mode | stat.S_IXUSR | stat.S_IXGRP)
        added += 1
        print(f"ported {dst.relative_to(MINE)}")
    print(f"{added} files ported")


if __name__ == "__main__":
    main()
