"""Scene model: COLMAP ingest -> host-side view table + stacked device arrays.

Replaces the reference's ``COLMAPModel`` (sfm.py:186-238) with a
host-side dataclass holding numpy metadata plus a ``ViewStack`` of
batched (V, ...) arrays ready for ``jax.device_put`` / vmapped geometry.

Parity notes (sfm.py:186-238):
  - PINHOLE-only assert (sfm.py:192).
  - ``image_scale``: width = int(w * s), height = int(h * s), then
    fx,cx scale by width/w and fy,cy by height/h (sfm.py:193-199).
  - Poses are stored cam->world (COLMAP's cam_from_world inverted,
    sfm.py:219-222).
  - Depth path = (depth_dir / name).with_stem('depth_' + stem)
    .with_suffix('.png') — subdirectories in image names are preserved
    (sfm.py:214). When that file is absent, alternative depth formats
    resolve (COLMAP dense .bin / .npy / float TIFF/EXR — see
    resolve_depth_path and io/depth_formats.py; beyond the reference).
  - ``scene[name]`` looks up views by image name (sfm.py:226-234).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

from sucre_tpu.io import colmap as colmap_io
from sucre_tpu.ops.distortion import DIST_PARAMS, colmap_to_canonical


# Alternative depth-map spellings tried (in order) when the reference's
# depth_<stem>.png is absent: same stem in the formats io.depth_formats
# reads, then COLMAP dense-workspace naming (patch_match_stereo writes
# stereo/depth_maps/<full image name>.geometric.bin) — so --depth-dir can
# point straight at a COLMAP dense workspace's depth_maps directory.
from sucre_tpu.io.depth_formats import ALT_DEPTH_SUFFIXES as _ALT_DEPTH_SUFFIXES

_COLMAP_DENSE_TAGS = (".geometric.bin", ".photometric.bin")


def resolve_depth_path(depth_dir: Path, name: str) -> Path:
    """Depth-map path for image ``name``: the reference derivation
    (depth_<stem>.png preserving subdirectories, sfm.py:214) when that
    file exists — else the first alternative format present. Falls back
    to the reference path when nothing exists, so the missing-file error
    (and the validator's depth-missing finding) points at the canonical
    name."""
    base = (depth_dir / name).parent
    stem = Path(name).stem
    default = base / f"depth_{stem}.png"
    if default.is_file():
        return default
    for suffix in _ALT_DEPTH_SUFFIXES:
        p = base / f"depth_{stem}{suffix}"
        if p.is_file():
            return p
    for tag in _COLMAP_DENSE_TAGS:
        p = depth_dir / f"{name}{tag}"
        if p.is_file():
            return p
    return default


def _qvec_to_rotmat_np(q: np.ndarray) -> np.ndarray:
    """COLMAP (w, x, y, z) quaternion -> rotation matrix, float64 numpy."""
    q = np.asarray(q, dtype=np.float64)
    q = q / np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


@dataclasses.dataclass
class View:
    """One registered image: paths + scaled intrinsics + cam->world pose."""

    image_id: int
    name: str
    rgb_path: Path
    depth_path: Path
    camera_id: int
    width: int
    height: int
    fx: float
    fy: float
    cx: float
    cy: float
    R: np.ndarray  # (3, 3) float32, cam->world
    t: np.ndarray  # (3,) float32, cam->world
    # Lens distortion: canonical (8,) vector + static model tag (see
    # ops/distortion.py). "none" = exact pinhole path (reference parity);
    # "rational"/"fisheye"/"fov"/"thin_prism_fisheye" fold ALL of
    # COLMAP's distorted camera models into the matching geometry
    # (capability beyond the reference, which asserts PINHOLE at
    # sfm.py:192).
    dist: np.ndarray = dataclasses.field(
        default_factory=lambda: np.zeros(DIST_PARAMS, np.float32)
    )
    dist_model: str = "none"

    @property
    def intrinsics(self) -> np.ndarray:
        return np.array([self.fx, self.fy, self.cx, self.cy], dtype=np.float32)

    @property
    def K(self) -> np.ndarray:
        return np.array(
            [[self.fx, 0, self.cx], [0, self.fy, self.cy], [0, 0, 1]], dtype=np.float32
        )

    def __repr__(self) -> str:
        return f"View({self.name!r}, {self.width}x{self.height})"


@dataclasses.dataclass
class ViewStack:
    """Batched per-view arrays for vmapped geometry; all (V, ...) float32.

    ``R``/``t`` are cam->world. All views in a stack share (width, height)
    so dense (V, H, W) ops have static uniform shapes.
    """

    image_ids: np.ndarray  # (V,) int32
    intrinsics: np.ndarray  # (V, 4) fx fy cx cy
    R: np.ndarray  # (V, 3, 3)
    t: np.ndarray  # (V, 3)
    width: int
    height: int
    dist: np.ndarray  # (V, 8) canonical distortion vectors (zeros = none)
    dist_model: str = "none"  # uniform static tag for the whole stack

    def __len__(self) -> int:
        return len(self.image_ids)


class Scene:
    """The scene model: all registered views of a COLMAP reconstruction.

    Use ``Scene.from_colmap(model_dir, image_dir, depth_dir, image_scale)``
    for the reference ingest path, or construct directly from ``View``s
    (synthetic scenes in tests).
    """

    def __init__(self, views: dict[int, View]):
        self.views = views
        self.name2id = {v.name: v.image_id for v in views.values()}

    @classmethod
    def from_colmap(
        cls,
        model_dir: Path | str,
        image_dir: Path | str,
        depth_dir: Path | str,
        image_scale: float = 1.0,
    ) -> "Scene":
        cameras, images = None, None
        if (Path(model_dir) / "cameras.bin").exists():
            # Native C++ one-pass parser when built (csrc/colmap_reader.cpp);
            # silent fallback to the Python parser.
            try:
                from sucre_tpu.io import native

                cameras, images = native.read_model_native(model_dir)
            except Exception:
                cameras = None
        if cameras is None:
            cameras, images, _ = colmap_io.read_model(model_dir)
        return cls.from_model_dicts(
            cameras, images, image_dir, depth_dir, image_scale
        )

    @classmethod
    def from_model_dicts(
        cls,
        cameras: dict,
        images: dict,
        image_dir: Path | str,
        depth_dir: Path | str,
        image_scale: float = 1.0,
    ) -> "Scene":
        """Build a Scene from already-parsed COLMAP dicts (the
        ``io.colmap`` dataclasses) — the ingest tail of ``from_colmap``
        for callers that parsed (or filtered) the model themselves."""
        image_dir = Path(image_dir)
        depth_dir = Path(depth_dir)

        scaled: dict[int, tuple] = {}
        for cam in cameras.values():
            # Pinhole models take the exact reference path (sfm.py:192
            # asserts PINHOLE; SIMPLE_PINHOLE is losslessly fx = fy = f).
            # Distorted COLMAP models (SIMPLE_RADIAL/RADIAL/OPENCV/
            # FULL_OPENCV/OPENCV_FISHEYE) embed into the canonical
            # distortion vector — capability beyond the reference, which
            # requires COLMAP's image undistorter first (sucre.py:270).
            try:
                dist_model, dist, fx, fy, u0, v0 = colmap_to_canonical(
                    cam.model, cam.params
                )
            except ValueError as e:
                raise ValueError(f"Camera {cam.camera_id}: {e}") from None
            width = int(cam.width * image_scale)
            height = int(cam.height * image_scale)
            scale_w = width / cam.width
            scale_h = height / cam.height
            # Distortion acts on NORMALIZED coordinates, which a pixel
            # rescale leaves unchanged — the canonical vector is
            # image_scale-invariant while fx/fy/cx/cy scale.
            scaled[cam.camera_id] = (
                width,
                height,
                fx * scale_w,
                fy * scale_h,
                u0 * scale_w,
                v0 * scale_h,
                dist,
                dist_model,
            )

        views: dict[int, View] = {}
        for im in images.values():
            # COLMAP gives cam_from_world; store the inverse (cam->world).
            R_wc = _qvec_to_rotmat_np(im.qvec)
            t_wc = np.asarray(im.tvec, dtype=np.float64)
            R_cw = R_wc.T
            t_cw = -R_wc.T @ t_wc
            if im.camera_id not in scaled:
                raise ValueError(
                    f"image {im.name!r} references camera_id "
                    f"{im.camera_id}, which is not in the model's cameras "
                    f"({sorted(scaled)}) — truncated or filtered model?"
                )
            width, height, fx, fy, cx, cy, dist, dist_model = scaled[im.camera_id]
            rgb_path = image_dir / im.name
            # with_stem semantics (sfm.py:214): nested names like
            # 'cam0/img.jpg' keep their subdirectory ->
            # depth_dir/cam0/depth_img.png (flattening would collide
            # same-basename images from different subdirs). Alternative
            # formats (COLMAP dense .bin, .npy, float TIFF/EXR) resolve
            # when the reference PNG is absent.
            depth_path = resolve_depth_path(depth_dir, im.name)
            views[im.image_id] = View(
                image_id=im.image_id,
                name=im.name,
                rgb_path=rgb_path,
                depth_path=depth_path,
                camera_id=im.camera_id,
                width=width,
                height=height,
                fx=fx,
                fy=fy,
                cx=cx,
                cy=cy,
                R=R_cw.astype(np.float32),
                t=t_cw.astype(np.float32),
                dist=np.asarray(dist, np.float32),
                dist_model=dist_model,
            )
        return cls(views)

    def __getitem__(self, image_name: str) -> View:
        if image_name not in self.name2id:
            raise KeyError(
                f"Image {image_name!r} is not in the COLMAP model "
                f"({len(self.views)} registered images)."
            )
        return self.views[self.name2id[image_name]]

    def __len__(self) -> int:
        return len(self.views)

    def __repr__(self) -> str:
        return f"Scene({len(self.views)} views)"

    def view_list(self) -> list[View]:
        return list(self.views.values())

    @staticmethod
    def stack(views: list[View]) -> ViewStack:
        """Stack views with uniform dims into batched arrays."""
        if not views:
            raise ValueError(
                "ViewStack of zero views (did culling drop everything?)"
            )
        widths = {v.width for v in views}
        heights = {v.height for v in views}
        if len(widths) != 1 or len(heights) != 1:
            raise ValueError(
                "ViewStack requires uniform image dimensions; bucket views by "
                f"(width, height) first (got widths={widths}, heights={heights})"
            )
        from sucre_tpu.ops.distortion import resolve_dist_model

        dist_model = resolve_dist_model(v.dist_model for v in views)
        return ViewStack(
            image_ids=np.array([v.image_id for v in views], np.int32),
            intrinsics=np.stack([v.intrinsics for v in views]).astype(np.float32),
            R=np.stack([v.R for v in views]).astype(np.float32),
            t=np.stack([v.t for v in views]).astype(np.float32),
            width=views[0].width,
            height=views[0].height,
            dist=np.stack([v.dist for v in views]).astype(np.float32),
            dist_model=dist_model,
        )
