"""Occupancy-grid world: ROS-format map loading, distance-transform field,
sphere-traced lidar, and map-geometry collision checks.

Capability match for f1tenth_gym's bitmap world (reference
deprecated/f1tenth_gym/gym/f110_gym/envs/laser_models.py:36-250 — scipy EDT
+ njit per-ray marching — and envs/track.py:200-240 — yaml+png loading with
FLIP_TOP_BOTTOM and the 128 binarization threshold), so the reference's real
racetrack maps (Spielberg, Example, ...) load directly.

TPU-first formulation: the distance field is ONE (H, W) device array and the
lidar is sphere tracing — every ray advances by the sampled clearance, all
(pose, beam) pairs at once, a fixed-trip ``fori_loop`` of bilinear gathers.
No per-ray host loops, no data-dependent control flow, batched over poses.
"""

from __future__ import annotations

import os
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class OccupancyMap(NamedTuple):
    """Distance-transformed occupancy grid in world coordinates.

    ``dist[r, c]`` is the distance (meters) from cell (row r, col c) to the
    nearest obstacle; row 0 is the map origin's corner (images are flipped
    top-bottom at load, like the reference's Track.from_track_name).
    """

    dist: jnp.ndarray  # (H, W) meters-to-nearest-obstacle
    origin_x: jnp.ndarray  # world x of grid corner (0, 0)
    origin_y: jnp.ndarray
    origin_c: jnp.ndarray  # cos/sin of the map origin rotation
    origin_s: jnp.ndarray
    resolution: jnp.ndarray  # meters per cell


class ScanSpec(NamedTuple):
    """Scanner geometry (f1tenth 270-degree scanner defaults, matching
    reference ScanSimulator2D, laser_models.py:306-330)."""

    n_beams: int = 64
    fov: float = 4.7
    max_range: float = 30.0
    n_iters: int = 64  # sphere-trace iterations (fixed trip count)
    eps: float = 1e-4  # hit threshold, meters (ref ScanSimulator2D eps)


# ------------------------------------------------------------- device side

@jax.jit
def distance_at(omap: OccupancyMap, x, y):
    """Bilinear sample of the distance field at world points. Out-of-map
    points return 0 (treated as obstacle). Batched over leading axes."""
    xt = jnp.asarray(x) - omap.origin_x
    yt = jnp.asarray(y) - omap.origin_y
    xr = xt * omap.origin_c + yt * omap.origin_s
    yr = -xt * omap.origin_s + yt * omap.origin_c
    # continuous cell coords; dist[r, c] lives at the cell center
    cc = xr / omap.resolution - 0.5
    rr = yr / omap.resolution - 0.5
    h, w = omap.dist.shape
    r0 = jnp.clip(jnp.floor(rr).astype(jnp.int32), 0, h - 2)
    c0 = jnp.clip(jnp.floor(cc).astype(jnp.int32), 0, w - 2)
    fr = jnp.clip(rr - r0, 0.0, 1.0)
    fc = jnp.clip(cc - c0, 0.0, 1.0)
    d00 = omap.dist[r0, c0]
    d01 = omap.dist[r0, c0 + 1]
    d10 = omap.dist[r0 + 1, c0]
    d11 = omap.dist[r0 + 1, c0 + 1]
    d = ((1 - fr) * ((1 - fc) * d00 + fc * d01)
         + fr * ((1 - fc) * d10 + fc * d11))
    inside = ((xr >= 0) & (xr < w * omap.resolution)
              & (yr >= 0) & (yr < h * omap.resolution))
    return jnp.where(inside, d, 0.0)


@partial(jax.jit, static_argnames=("spec",))
def trace_rays(omap: OccupancyMap, x, y, theta,
               spec: ScanSpec = ScanSpec()):
    """Simulate a scan by sphere tracing the distance field (the reference's
    trace_ray loop, laser_models.py:150-173, vectorized over every
    (pose, beam) pair). Returns ranges (..., n_beams)."""
    dt = jnp.result_type(jnp.asarray(x).dtype, jnp.asarray(theta).dtype,
                         omap.dist.dtype)
    angles = jnp.linspace(-spec.fov / 2, spec.fov / 2, spec.n_beams,
                          dtype=dt)
    bt = jnp.asarray(theta, dt)[..., None] + angles
    cx, sy = jnp.cos(bt), jnp.sin(bt)
    px = jnp.broadcast_to(jnp.asarray(x, dt)[..., None], bt.shape)
    py = jnp.broadcast_to(jnp.asarray(y, dt)[..., None], bt.shape)
    total = jnp.zeros_like(px)

    def body(_, carry):
        px, py, total = carry
        d = distance_at(omap, px, py)
        live = (d > spec.eps) & (total <= spec.max_range)
        step = jnp.where(live, d, 0.0)
        return px + step * cx, py + step * sy, total + step

    _, _, total = jax.lax.fori_loop(0, spec.n_iters, body, (px, py, total))
    return jnp.minimum(total, spec.max_range)


@jax.jit
def map_clearance(omap: OccupancyMap, x, y, radius=0.0):
    """Clearance of a disc-footprint pose to map geometry (negative =
    collision) — the map half of the reference's collision checking."""
    return distance_at(omap, x, y) - radius


@partial(jax.jit, static_argnames=("n_discs",))
def footprint_clearance(omap: OccupancyMap, x, y, theta,
                        length: float = 0.58, width: float = 0.31,
                        n_discs: int = 5):
    """Rectangle-footprint clearance to map geometry via a covering-disc
    chain: ``n_discs`` discs of radius sqrt((L/2n)^2 + (W/2)^2) spaced along
    the heading cover the (length x width) rectangle exactly, so the test is
    conservative by only r - W/2 (~1 cm at car scale with n=5, vs the
    ~10-15 cm of a single CoG disc). The rectangle-accurate map half of the
    reference's footprint collision checking (collision_models.py vertices).
    Negative = collision."""
    seg = length / n_discs
    r = jnp.sqrt((seg / 2.0) ** 2 + (width / 2.0) ** 2)
    offs = (jnp.arange(n_discs) - (n_discs - 1) / 2.0) * seg  # (n,)
    cx = jnp.asarray(x)[..., None] + offs * jnp.cos(jnp.asarray(theta))[..., None]
    cy = jnp.asarray(y)[..., None] + offs * jnp.sin(jnp.asarray(theta))[..., None]
    return jnp.min(distance_at(omap, cx, cy), axis=-1) - r


# --------------------------------------------------------------- host side

def from_bitmap(free: np.ndarray, resolution: float,
                origin=(0.0, 0.0, 0.0), dtype=jnp.float32) -> OccupancyMap:
    """Build an OccupancyMap from a binary grid (True/nonzero = free space,
    row 0 = the origin corner). EDT is computed host-side once (reference
    get_dt, laser_models.py:36-50) by the native C++ transform
    (native/edt.cpp, multithreaded exact Felzenszwalb), falling back to scipy
    when no toolchain is available; the field then lives on device."""
    from irbfn_tpu import native

    if native.available():
        dist = native.edt(free, float(resolution))
    else:
        from scipy.ndimage import distance_transform_edt

        dist = resolution * distance_transform_edt(np.asarray(free) != 0)
    ox, oy, oth = origin
    return OccupancyMap(
        jnp.asarray(dist, dtype), jnp.asarray(ox, dtype),
        jnp.asarray(oy, dtype), jnp.asarray(np.cos(oth), dtype),
        jnp.asarray(np.sin(oth), dtype), jnp.asarray(resolution, dtype))


def load_map_yaml(yaml_path: str, dtype=jnp.float32) -> OccupancyMap:
    """Load a ROS map-server yaml+image pair (the reference's map format:
    image/resolution/origin/negate keys, track.py:118-240). Pixels are
    binarized at 128 after the reference's top-bottom flip."""
    import yaml
    from PIL import Image

    with open(yaml_path) as f:
        spec = yaml.safe_load(f)
    img_path = os.path.join(os.path.dirname(yaml_path), spec["image"])
    img = np.asarray(
        Image.open(img_path).transpose(Image.FLIP_TOP_BOTTOM).convert("L"),
        np.float32)
    if int(spec.get("negate", 0)):
        img = 255.0 - img
    free = img > 128.0  # ref track.py:214-215 binarization
    origin = tuple(float(v) for v in spec["origin"][:3])
    return from_bitmap(free, float(spec["resolution"]), origin, dtype)


def save_map_yaml(omap_free: np.ndarray, resolution: float, origin,
                  yaml_path: str) -> None:
    """Write a yaml+png pair in the reference's map format (inverse of
    load_map_yaml; lets synthetic corridor worlds round-trip as files)."""
    import yaml
    from PIL import Image

    img = np.where(np.asarray(omap_free) != 0, 255, 0).astype(np.uint8)
    png_path = os.path.splitext(yaml_path)[0] + ".png"
    Image.fromarray(img[::-1]).save(png_path)  # un-flip for file orientation
    spec = {"image": os.path.basename(png_path),
            "resolution": float(resolution),
            "origin": [float(origin[0]), float(origin[1]),
                       float(origin[2]) if len(origin) > 2 else 0.0],
            "negate": 0, "occupied_thresh": 0.45, "free_thresh": 0.196}
    with open(yaml_path, "w") as f:
        yaml.safe_dump(spec, f)


def rasterize_track(track, half_width: float, resolution: float = 0.05,
                    margin: float = 1.0, dtype=jnp.float32) -> OccupancyMap:
    """Rasterize a Track's corridor into an occupancy grid: free space is
    every cell within ``half_width`` of the raceline polyline. Gives the
    synthetic tracks a real bitmap world (lidar + collision parity with
    yaml+png maps)."""
    xs = np.asarray(track.raceline.xs, np.float64)
    ys = np.asarray(track.raceline.ys, np.float64)
    lo = np.array([xs.min(), ys.min()]) - half_width - margin
    hi = np.array([xs.max(), ys.max()]) + half_width + margin
    w = int(np.ceil((hi[0] - lo[0]) / resolution))
    h = int(np.ceil((hi[1] - lo[1]) / resolution))
    # occupied = EDT-to-raceline > half_width; compute via EDT of the
    # rasterized polyline (distance in cells, exact to sub-cell)
    from scipy.ndimage import distance_transform_edt

    grid = np.ones((h, w), bool)
    # stamp the polyline densely enough that no cell is skipped
    pts = np.stack([xs, ys], axis=-1)
    seg = np.roll(pts, -1, axis=0) - pts
    seg_len = np.linalg.norm(seg, axis=-1)
    n_sub = np.maximum(1, np.ceil(seg_len / (0.5 * resolution)).astype(int))
    all_xy = np.concatenate([
        pts[i] + np.linspace(0, 1, n_sub[i], endpoint=False)[:, None] * seg[i]
        for i in range(len(pts))])
    cc = ((all_xy[:, 0] - lo[0]) / resolution).astype(int)
    rr = ((all_xy[:, 1] - lo[1]) / resolution).astype(int)
    ok = (rr >= 0) & (rr < h) & (cc >= 0) & (cc < w)
    grid[rr[ok], cc[ok]] = False
    dist_to_line = resolution * distance_transform_edt(grid)
    free = dist_to_line <= half_width
    return from_bitmap(free, resolution, (lo[0], lo[1], 0.0), dtype)


def raceline_from_csv(csv_path: str, dtype=jnp.float32):
    """Parse a reference raceline/centerline CSV (`;`-separated, `#`
    comments, columns s;x;y;psi;kappa;vx[;ax] — ref track.py:100-116) into a
    Raceline. Centerline files (x;y;w_left;w_right) are detected by column
    count and get geometry-derived yaw/curvature and unit speed."""
    from irbfn_tpu.sim.track import Raceline

    # delimiter varies by asset: racelines use ';', the bundled centerlines
    # use ',' (e.g. Oschersleben_centerline.csv) — sniff the first data line
    with open(csv_path) as f:
        for line in f:
            if line.strip() and not line.lstrip().startswith("#"):
                delim = ";" if ";" in line else ","
                break
        else:
            raise ValueError(f"no data rows in {csv_path}")
    raw = np.genfromtxt(csv_path, delimiter=delim, comments="#")
    if raw.shape[1] >= 6:  # raceline: s; x; y; psi; kappa; vx
        ss, xs, ys, yaws, ks, vxs = (raw[:, i] for i in range(6))
    else:  # centerline: x; y; [w_left; w_right]
        xs, ys = raw[:, 0], raw[:, 1]
        d = np.linalg.norm(np.diff(np.stack([xs, ys], -1), axis=0), axis=-1)
        ss = np.concatenate([[0.0], np.cumsum(d)])[:len(xs)]
        tang = np.gradient(np.stack([xs, ys], -1), axis=0)
        yaws = np.arctan2(tang[:, 1], tang[:, 0])
        ks = np.gradient(np.unwrap(yaws)) / np.maximum(
            np.gradient(ss), 1e-9)
        vxs = np.ones_like(xs)
    # drop duplicated closing point
    if np.hypot(xs[-1] - xs[0], ys[-1] - ys[0]) < 1e-6:
        ss, xs, ys, yaws, ks, vxs = (a[:-1] for a in
                                     (ss, xs, ys, yaws, ks, vxs))
    d = np.linalg.norm(
        np.roll(np.stack([xs, ys], -1), -1, axis=0)
        - np.stack([xs, ys], -1), axis=-1)
    length = float(ss[-1] + d[-1])
    return Raceline(*[jnp.asarray(a, dtype) for a in
                      (ss, xs, ys, yaws, ks, vxs)],
                    jnp.asarray(length, dtype))


def load_track_bundle(map_dir: str, name: str | None = None,
                      dtype=jnp.float32, prefer: str = "raceline"):
    """Load a reference-format track directory (<name>_map.yaml +
    <name>_map.png + <name>_raceline.csv / <name>_centerline.csv) into a
    (Track, OccupancyMap) pair — the reference's Track.from_track_name
    surface (track.py:201-240). ``prefer`` picks which line to try first
    (``"raceline"`` or ``"centerline"`` — the centerline stays mid-track
    with maximal wall clearance; some bundled racelines run sub-car-width
    from walls, see scripts/eval_closed_loop.py --car_radius)."""
    from irbfn_tpu.sim.track import Track

    name = name or os.path.basename(os.path.normpath(map_dir))
    omap = load_map_yaml(os.path.join(map_dir, f"{name}_map.yaml"), dtype)
    order = ("raceline", "centerline")
    if prefer == "centerline":
        order = ("centerline", "raceline")
    for suffix in order:
        csv_path = os.path.join(map_dir, f"{name}_{suffix}.csv")
        if os.path.exists(csv_path):
            return Track(raceline_from_csv(csv_path, dtype)), omap
    raise FileNotFoundError(
        f"no {name}_raceline.csv or {name}_centerline.csv in {map_dir}")
