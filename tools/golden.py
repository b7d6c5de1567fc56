"""Golden-image comparison against the reference's committed renders.

The reference repo commits 50 milestone renders (reference: output/book{1,2,3},
output/output.jpg) — its only correctness baseline (SURVEY.md §4).  This tool
renders one of our scenes with matching camera/aspect, downsamples both images
to a common small grid (which averages away Monte-Carlo noise and JPEG
artifacts), and reports mean-absolute-error in [0,1] linear-ish (post-gamma)
space.

Usage::

    python -m tools.golden --scene cornell_box --golden output/book3/image12.jpg \
        --spp 500 --size 300
    python -m tools.golden --all   # run the curated scene->golden map

Pass/fail guidance: MAE <= 0.05 after 500+ spp is a match within MC noise +
JPEG quantization for these scenes; 0.05-0.10 indicates a visible but minor
deviation; > 0.10 is a real mismatch.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REFERENCE = os.environ.get("RT2022_REFERENCE_DIR", "/root/reference")

# scene -> golden relpath + structural-deviation notes.  The committed book
# renders are historical milestones whose code was partly edited away; only
# output/output.jpg was produced by the frozen sources.  Known structural
# deviations that put an MAE floor under a scene regardless of spp:
#   random_scene  — the reference builds it with an UNSEEDED thread_rng
#                   (scene.rs:30-35): its own golden is unreproducible even
#                   by itself; layout differs, palette/exposure comparable.
#   cornell_box   — frozen source swapped red/green walls and brightened the
#                   light 15->60 vs every committed cornell golden
#                   (scene.rs:168-176); cornell_box_book is the golden-
#                   faithful variant.
#   final_scene / cornell_smoke — unseeded rng for the box-height field /
#                   identical build, plus milestone-era material tweaks.
GOLDEN_MAP = {
    # checker-ground + motion-blur variant of the sphere field (the frozen
    # random_scene, scene.rs:22-84); layout differs (unseeded rng)
    "random_scene": "output/book2/image2.jpg",
    "two_perlin_spheres": "output/book2/image13.jpg",  # marble sphere + ground
    "simple_light": "output/book2/image17.jpg",
    "cornell_box": "output/book2/image18.jpg",  # frozen cfg vs book colors: wall swap + 4x light
    "cornell_box_book": "output/book2/image18.jpg",  # empty cornell, book colors
    "cornell_smoke": "output/book2/image21.jpg",  # two smoke boxes
    "final_scene": "output/book2/Finanscene.jpg",  # book2 final composite
    "wwscene": "output/output.jpg",  # the frozen main.rs render
}

# Scenes with NO committed golden anywhere in the reference's 50 renders
# (verified by visual inspection of output/book{1,2,3} + output/): the
# two_spheres checker pair and the standalone earth sphere were never
# committed.  They are validated by unit oracles + the scan/regen
# cross-check instead; GOLDEN.md records this.
NO_GOLDEN = ("two_spheres", "earth", "obj_uv_demo")


def downsample(img: np.ndarray, gh: int, gw: int) -> np.ndarray:
    """Box-average an (H, W, 3) float image to (gh, gw, 3)."""
    h, w, _ = img.shape
    ys = (np.arange(h) * gh // h).clip(0, gh - 1)
    xs = (np.arange(w) * gw // w).clip(0, gw - 1)
    out = np.zeros((gh, gw, 3))
    cnt = np.zeros((gh, gw, 1))
    np.add.at(out, (ys[:, None], xs[None, :]), img)
    np.add.at(cnt, (ys[:, None], xs[None, :]), 1.0)
    return out / cnt


def compare(ours: np.ndarray, golden: np.ndarray, grid: int = 64):
    """Both images float [0,1] (H, W, 3); returns metric dict."""
    gh = grid
    gw = max(1, int(round(grid * ours.shape[1] / ours.shape[0])))
    a = downsample(ours, gh, gw)
    b = downsample(golden, gh, gw)
    mae = float(np.mean(np.abs(a - b)))
    rmse = float(np.sqrt(np.mean((a - b) ** 2)))
    # exposure-normalized MAE: forgives a uniform brightness offset
    s = float(np.sum(a * b) / max(np.sum(a * a), 1e-9))
    mae_n = float(np.mean(np.abs(a * s - b)))
    return {"mae": mae, "rmse": rmse, "exposure": s, "mae_norm": mae_n}


def render_scene(name: str, width: int, height: int, spp: int, seed: int = 0):
    from raytracer2022_tpu import RenderConfig, make_camera
    from raytracer2022_tpu.render.film import tonemap_u8
    from raytracer2022_tpu.render.renderer import render_sum_n
    from raytracer2022_tpu.scene.library import SCENES

    bundle = SCENES[name](seed=seed)
    kw = dict(bundle.camera_kwargs)
    kw["aspect_ratio"] = width / height
    cam = make_camera(**kw)
    cfg = RenderConfig(
        width=width, height=height, spp=spp, max_depth=50,
        background=bundle.background, seed=seed,
    )
    total, n = render_sum_n(bundle.scene, cam, cfg)
    return np.asarray(tonemap_u8(total, n), dtype=np.float64) / 255.0


def run_one(scene: str, golden_rel: str, spp: int, size: int, grid: int, out_dir=None):
    from PIL import Image

    gpath = os.path.join(REFERENCE, golden_rel)
    g = np.asarray(Image.open(gpath).convert("RGB"), dtype=np.float64) / 255.0
    gh, gw = g.shape[:2]
    height = size
    width = max(1, int(round(size * gw / gh)))
    ours = render_scene(scene, width, height, spp)
    m = compare(ours, g, grid=grid)
    m.update(scene=scene, golden=golden_rel, width=width, height=height, spp=spp)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        Image.fromarray((ours * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"{scene}.png")
        )
    return m


def find_best(scene: str, spp: int, size: int, grid: int, aspect: float, out_dir=None):
    """Render ``scene`` once and rank ALL goldens of the same aspect by MAE."""
    from PIL import Image

    height = size
    width = max(1, int(round(size * aspect)))
    ours = render_scene(scene, width, height, spp)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        Image.fromarray((ours * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"{scene}.png")
        )
    rows = []
    for sub in ["output/book1", "output/book2", "output/book3", "output"]:
        d = os.path.join(REFERENCE, sub)
        for f in sorted(os.listdir(d)):
            p = os.path.join(d, f)
            if not f.lower().endswith((".jpg", ".png")) or not os.path.isfile(p):
                continue
            g = np.asarray(Image.open(p).convert("RGB"), dtype=np.float64) / 255.0
            ga = g.shape[1] / g.shape[0]
            if abs(ga - aspect) > 0.02:
                continue
            m = compare(ours, g, grid=grid)
            rows.append((m["mae"], os.path.join(sub, f), m))
    rows.sort(key=lambda r: r[0])
    return rows


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene")
    ap.add_argument("--golden")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--find", action="store_true", help="rank all goldens by match")
    ap.add_argument("--aspect", type=float, default=None)
    ap.add_argument("--spp", type=int, default=500)
    ap.add_argument("--size", type=int, default=256, help="render height in px")
    ap.add_argument("--grid", type=int, default=64, help="comparison grid height")
    ap.add_argument("--save-dir", default=None, help="also save our renders here")
    args = ap.parse_args(argv)

    if args.find:
        from raytracer2022_tpu.scene.library import SCENES  # noqa: F401

        aspect = args.aspect or (16 / 9)
        rows = find_best(args.scene, args.spp, args.size, args.grid, aspect, args.save_dir)
        for mae, rel, m in rows[:6]:
            print(json.dumps({"golden": rel, **m}))
        return 0

    jobs = (
        list(GOLDEN_MAP.items())
        if args.all
        else [(args.scene, args.golden or GOLDEN_MAP[args.scene])]
    )
    results = []
    for scene, rel in jobs:
        m = run_one(scene, rel, args.spp, args.size, args.grid, args.save_dir)
        results.append(m)
        print(json.dumps(m))
    worst = max(r["mae"] for r in results)
    print(f"# worst MAE = {worst:.4f} over {len(results)} scene(s)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
