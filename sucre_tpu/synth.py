"""Synthetic scene generation: known geometry => exact expectations.

Used by the test suite, the benchmark harness and demos.

Builds a camera rig looking at a textured plane (or a smooth analytic
surface), writes a COLMAP model + 16-bit depth PNGs + RGB images to
disk, and returns the ground truth so tests can verify matching and
restoration against analytic values.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import cv2
import numpy as np

from sucre_tpu.io import colmap as colmap_io
from sucre_tpu.ops import distortion as distortion_ops

# Default coefficients per COLMAP camera model for distorted synthetic
# scenes — moderate wide-angle values, invertible across the synth FOV.
_DIST_DEFAULTS = {
    "SIMPLE_RADIAL": (-0.18,),
    "RADIAL": (-0.18, 0.04),
    "OPENCV": (-0.2, 0.05, 8e-4, -6e-4),
    "FULL_OPENCV": (-0.2, 0.05, 8e-4, -6e-4, 0.01, -0.05, 0.011, -0.002),
    "OPENCV_FISHEYE": (-0.04, 0.01, -0.005, 0.001),
    "SIMPLE_RADIAL_FISHEYE": (-0.04,),
    "RADIAL_FISHEYE": (-0.04, 0.01),
    "FOV": (0.9,),
    "THIN_PRISM_FISHEYE": (
        -0.03, 0.008, 6e-4, -4e-4, -0.002, 5e-4, 8e-4, -5e-4,
    ),
}

_SINGLE_FOCAL = ("SIMPLE_RADIAL", "RADIAL", "SIMPLE_RADIAL_FISHEYE",
                 "RADIAL_FISHEYE")


def _colmap_params(model: str, fx, fy, cx, cy, coeffs) -> np.ndarray:
    """Assemble a COLMAP params vector for the given camera model."""
    if model == "PINHOLE":
        return np.array([fx, fy, cx, cy], np.float64)
    if model in _SINGLE_FOCAL:
        assert fx == fy, f"{model} has a single focal length"
        return np.array([fx, cx, cy, *coeffs], np.float64)
    if model in ("OPENCV", "FULL_OPENCV", "OPENCV_FISHEYE", "FOV",
                 "THIN_PRISM_FISHEYE"):
        return np.array([fx, fy, cx, cy, *coeffs], np.float64)
    raise ValueError(f"unsupported synthetic camera model {model!r}")


@dataclasses.dataclass
class SyntheticScene:
    model_dir: Path
    image_dir: Path
    depth_dir: Path
    names: list[str]
    # Ground truth
    J: np.ndarray  # (H, W, 3) true restored image (plane texture as seen by cam 0)
    J_views: list  # per-view true restored images
    B: np.ndarray  # (3,)
    beta: np.ndarray  # (3,)
    gamma: np.ndarray  # (3,)
    width: int
    height: int
    poses: list[tuple[np.ndarray, np.ndarray]]  # cam->world (R, t)
    K: np.ndarray  # (3, 3)
    plane_z: float
    camera_model: str = "PINHOLE"  # COLMAP model written to the scene
    dist: np.ndarray | None = None  # canonical (8,) vector (None = pinhole)
    dist_model: str = "none"  # canonical tag (ops/distortion.py)


def _rotmat_to_qvec(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> COLMAP (w, x, y, z) quaternion."""
    K = (
        np.array(
            [
                [R[0, 0] - R[1, 1] - R[2, 2], 0, 0, 0],
                [R[0, 1] + R[1, 0], R[1, 1] - R[0, 0] - R[2, 2], 0, 0],
                [R[0, 2] + R[2, 0], R[1, 2] + R[2, 1], R[2, 2] - R[0, 0] - R[1, 1], 0],
                [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1], R[0, 0] + R[1, 1] + R[2, 2]],
            ]
        )
        / 3.0
    )
    w, V = np.linalg.eigh(K)
    q = V[[3, 0, 1, 2], np.argmax(w)]
    if q[0] < 0:
        q = -q
    return q


def texture(u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Smooth analytic plane texture in [0.05, 0.95], per RGB channel.

    u, v are world-plane coordinates (meters). Returns (..., 3).
    """
    r = 0.5 + 0.45 * np.sin(2.0 * u) * np.cos(1.5 * v)
    g = 0.5 + 0.45 * np.cos(1.3 * u + 0.7) * np.sin(1.1 * v)
    b = 0.5 + 0.45 * np.sin(0.9 * u * v * 0.5 + 1.0)
    return np.stack([r, g, b], axis=-1)


def make_scene(
    tmp_path: Path,
    n_views: int = 5,
    width: int = 64,
    height: int = 48,
    plane_z: float = 3.0,
    B=(0.20, 0.25, 0.30),
    beta=(0.12, 0.10, 0.08),
    gamma=(0.35, 0.30, 0.25),
    slope: float = 0.35,
    binary: bool = True,
    jpeg: bool = False,
    two_cameras: bool = False,
    light: bool = False,
    spread: float = 1.2,
    camera_model: str = "PINHOLE",
    dist_coeffs: tuple | None = None,
    camera_model2: str | None = None,
    n_points3d: int = 0,
) -> SyntheticScene:
    """Cameras at z=0 looking down +z at the tilted plane Z = plane_z +
    slope*X, small x/y camera offsets.

    Images are rendered with the underwater formation model
    I = J exp(-beta z) + B (1 - exp(-gamma z)) with z the camera-to-point
    range, J sampled from the analytic ``texture`` at the plane hit point.
    The tilt makes z vary across the image so beta/gamma are identifiable.

    ``camera_model`` selects the COLMAP camera model written to the scene
    (default PINHOLE; any of SIMPLE_RADIAL/RADIAL/OPENCV/FULL_OPENCV/
    OPENCV_FISHEYE renders through the lens distortion — rays bend per
    ops/distortion.py, so depth maps, images, and the COLMAP model are
    mutually consistent exactly like a real distorted survey).
    ``dist_coeffs`` overrides the per-model default coefficients.
    ``camera_model2`` gives every odd view a SECOND camera with a
    different lens model (same dimensions unless ``two_cameras`` also
    shrinks them) — a mixed rig, e.g. a fisheye navigation camera and a
    pinhole documentation camera in one COLMAP reconstruction.
    ``n_points3d`` additionally populates the sparse map the way COLMAP
    would: that many plane points become points3D entries with 2D
    keypoint tracks (``xys`` + ``point3D_ids``) in every image that sees
    them — the ground truth for the validator's SfM-consistency check.
    """
    model_dir = tmp_path / "model"
    image_dir = tmp_path / "images"
    depth_dir = tmp_path / "depth"
    for d in (model_dir, image_dir, depth_dir):
        d.mkdir(parents=True, exist_ok=True)

    B = np.asarray(B, np.float64)
    beta = np.asarray(beta, np.float64)
    gamma = np.asarray(gamma, np.float64)

    fx = fy = 0.8 * width
    cx, cy = width / 2.0, height / 2.0
    K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)
    if camera_model != "PINHOLE" and dist_coeffs is None:
        dist_coeffs = _DIST_DEFAULTS[camera_model]
    coeffs = tuple(dist_coeffs or ())

    cameras = {
        1: colmap_io.ColmapCamera(
            camera_id=1,
            model=camera_model,
            width=width,
            height=height,
            params=_colmap_params(camera_model, fx, fy, cx, cy, coeffs),
        )
    }
    if two_cameras or camera_model2:
        # a second rig: different dimensions under ``two_cameras``
        # (exercises the per-dims bucketing of the matching stage) and/or
        # a different lens model under ``camera_model2`` (exercises the
        # per-stack-class bucketing + per-camera-tag matching of mixed rigs)
        model2 = camera_model2 or camera_model
        if two_cameras:
            w2, h2 = (3 * width) // 4, (3 * height) // 4
        else:
            w2, h2 = width, height
        coeffs2 = coeffs if model2 == camera_model else tuple(
            _DIST_DEFAULTS[model2] if model2 != "PINHOLE" else ()
        )
        cameras[2] = colmap_io.ColmapCamera(
            camera_id=2,
            model=model2,
            width=w2,
            height=h2,
            params=_colmap_params(
                model2, 0.8 * w2, 0.8 * w2, w2 / 2.0, h2 / 2.0, coeffs2
            ),
        )
    # Canonical distortion of camera 1 (recorded on the returned scene;
    # the render below re-derives the tag/vector PER CAMERA).
    dist_tag, dist_vec, *_ = distortion_ops.colmap_to_canonical(
        camera_model, cameras[1].params
    )

    # Camera positions: spread along x with varying altitude (z), identity
    # orientation (looking +z). The z spread gives every pixel genuine
    # range diversity across views — without it the per-pixel J can absorb
    # any global-parameter error (the real identifiability driver in
    # survey data).
    # ``spread`` is the total x extent of the camera line: the default
    # keeps all views overlapping; large values make a transect where
    # distant views share no surface (exercises the overlap culling).
    offsets = np.linspace(-spread / 2, spread / 2, n_views)
    offsets_z = 0.5 * np.cos(2.1 * np.arange(n_views))
    images = {}
    names = []
    poses = []
    J_views = []
    J0 = None
    for i, dx in enumerate(offsets):
        image_id = i + 1
        name = f"img_{i:03d}.{'jpg' if jpeg else 'png'}"
        names.append(name)
        cam_id = 2 if (2 in cameras and i % 2 == 1) else 1
        cam = cameras[cam_id]
        vw, vh = cam.width, cam.height
        vtag, vvec, vfx, vfy, vcx, vcy = distortion_ops.colmap_to_canonical(
            cam.model, cam.params
        )
        R_cw = np.eye(3)
        # Terrain-following altitude: the camera tracks the tilted plane
        # (z = slope * x) like a survey vehicle holding constant height
        # over the seafloor, plus the cos() altitude variation that gives
        # the fit its range diversity. Without the slope term, wide
        # transects (|dx| > plane_z / slope) put the plane BEHIND the
        # early cameras — zc < 0 is unrepresentable depth, so those
        # views would export as all-invalid.
        t_cw = np.array([dx, 0.02 * i, slope * dx + offsets_z[i]])
        poses.append((R_cw.astype(np.float32), t_cw.astype(np.float32)))
        # COLMAP stores world->cam
        R_wc = R_cw.T
        t_wc = -R_cw.T @ t_cw
        images[image_id] = colmap_io.ColmapImage(
            image_id=image_id,
            qvec=_rotmat_to_qvec(R_wc),
            tvec=t_wc,
            camera_id=cam_id,
            name=name,
            xys=np.zeros((0, 2)),
            point3D_ids=np.zeros((0,), np.int64),
        )

        # Render: ray through pixel center hits the tilted plane
        # Z = plane_z + slope * X (world). Camera at (x0, y0, 0), identity
        # orientation: ray X = x0 + xr*zc, Z = zc =>
        # zc = (plane_z + slope*x0) / (1 - slope*xr).
        uuv, vvv = np.meshgrid(np.arange(vw), np.arange(vh))
        xr = (uuv + 0.5 - vcx) / vfx
        yr = (vvv + 0.5 - vcy) / vfy
        if vtag != "none":
            # the recorded pixel grid is DISTORTED: bend each pixel's ray
            # through THIS camera's lens model before intersecting the plane
            xr, yr = distortion_ops.undistort(
                vtag, vvec.astype(np.float64), xr, yr, xp=np
            )
            bad = ~np.isfinite(xr)
            xr = np.where(bad, 0.0, xr)
            yr = np.where(bad, 0.0, yr)
        else:
            bad = None
        zc = (plane_z + slope * t_cw[0] - t_cw[2]) / (1.0 - slope * xr)
        if bad is not None:
            zc = np.where(bad, 0.0, zc)  # depth 0 = invalid, like real holes
        Pw_x = t_cw[0] + xr * zc
        Pw_y = t_cw[1] + yr * zc
        J = texture(Pw_x, Pw_y)
        z = zc * np.sqrt(xr**2 + yr**2 + 1.0)  # camera-to-point range
        if light:
            # identity camera-to-light pose, sigma = I2 (reference light
            # model, sucre.py:52-64): lP = cP, l = exp(-|lp|^2/2), z doubles
            lpx, lpy = xr, yr
            l = np.exp(-(lpx**2 + lpy**2) / 2.0)[..., None]
            zz = 2.0 * z[..., None]
            I = l * (J * np.exp(-beta * zz) + B * (1 - np.exp(-gamma * zz)))
        else:
            I = J * np.exp(-beta * z[..., None]) + B * (1 - np.exp(-gamma * z[..., None]))
        I = np.clip(I, 0.0, 1.0)
        J_views.append(J.copy())
        if i == 0:
            J0 = J.copy()

        if jpeg:
            cv2.imwrite(
                str(image_dir / name),
                cv2.cvtColor((I * 255).round().astype(np.uint8), cv2.COLOR_RGB2BGR),
                [cv2.IMWRITE_JPEG_QUALITY, 98],
            )
        else:
            cv2.imwrite(
                str(image_dir / name),
                cv2.cvtColor((I * 255).round().astype(np.uint8), cv2.COLOR_RGB2BGR),
            )
        # out-of-u16-range depths (beyond 65.535 m, or behind the
        # camera) are UNREPRESENTABLE in the reference's format: export
        # them as 0 (invalid) so the oracle stays honest instead of
        # wrapping modulo 65536 into plausible-looking wrong values
        mm = np.round(zc * 1000.0)
        depth_mm = np.where(
            (mm > 0) & (mm <= 65535), mm, 0.0
        ).astype(np.uint16)
        # depth PNG stores the Z-depth (camera-frame z), parity with the
        # reference's millimeter 16-bit convention (loader.py:166-170)
        cv2.imwrite(str(depth_dir / f"depth_img_{i:03d}.png"), depth_mm)

    points3d: dict[int, colmap_io.ColmapPoint3D] = {}
    if n_points3d:
        # A COLMAP-style sparse map over the same plane: world points with
        # 2D keypoint tracks in every image that sees them, projected
        # through each camera's OWN lens model — mutually consistent with
        # the rendered depth maps by construction (the oracle for the
        # validator's SfM-consistency check).
        from sucre_tpu.scene import _qvec_to_rotmat_np

        rngp = np.random.default_rng(12345)
        Px = rngp.uniform(offsets.min() - 0.8, offsets.max() + 0.8, n_points3d)
        Py = rngp.uniform(-1.0, 1.0, n_points3d)
        Pw = np.stack([Px, Py, plane_z + slope * Px], axis=-1)
        rgb_pts = np.clip(texture(Px, Py) * 255, 0, 255).astype(np.uint8)
        per_xys: dict[int, list] = {iid: [] for iid in images}
        per_pid: dict[int, list] = {iid: [] for iid in images}
        tracks: dict[int, list] = {pid: [] for pid in range(1, n_points3d + 1)}
        for iid, im in images.items():
            cam = cameras[im.camera_id]
            vtag, vvec, vfx, vfy, vcx, vcy = distortion_ops.colmap_to_canonical(
                cam.model, cam.params
            )
            R_wc = _qvec_to_rotmat_np(im.qvec)
            Pc = Pw @ R_wc.T + np.asarray(im.tvec, np.float64)
            z = Pc[:, 2]
            with np.errstate(divide="ignore", invalid="ignore"):
                xn = Pc[:, 0] / z
                yn = Pc[:, 1] / z
            if vtag != "none":
                xd, yd = distortion_ops.distort(
                    vtag, vvec.astype(np.float64), xn, yn, xp=np
                )
            else:
                xd, yd = xn, yn
            pu = vfx * xd + vcx  # continuous +0.5-center pixel coords,
            pv = vfy * yd + vcy  # COLMAP's keypoint convention
            ok = (
                (z > 0.1) & np.isfinite(pu) & np.isfinite(pv)
                & (pu >= 0) & (pu < cam.width) & (pv >= 0) & (pv < cam.height)
            )
            for k in np.flatnonzero(ok):
                tracks[k + 1].append((iid, len(per_pid[iid])))
                per_xys[iid].append((pu[k], pv[k]))
                per_pid[iid].append(k + 1)
        for pid, tr in tracks.items():
            if len(tr) < 2:  # COLMAP only triangulates multi-view tracks
                continue
            points3d[pid] = colmap_io.ColmapPoint3D(
                point3D_id=pid, xyz=Pw[pid - 1], rgb=rgb_pts[pid - 1],
                error=0.5,
                image_ids=np.array([a for a, _ in tr], np.int32),
                point2D_idxs=np.array([b for _, b in tr], np.int32),
            )
        for iid in images:
            pids = np.asarray(per_pid[iid], np.int64)
            images[iid] = dataclasses.replace(
                images[iid],
                xys=np.asarray(per_xys[iid], np.float64).reshape(-1, 2),
                point3D_ids=np.where(
                    np.isin(pids, list(points3d)), pids, -1
                ).astype(np.int64),
            )

    if binary:
        colmap_io.write_cameras_bin(cameras, model_dir / "cameras.bin")
        colmap_io.write_images_bin(images, model_dir / "images.bin")
        colmap_io.write_points3D_bin(points3d, model_dir / "points3D.bin")
    else:
        colmap_io.write_cameras_txt(cameras, model_dir / "cameras.txt")
        colmap_io.write_images_txt(images, model_dir / "images.txt")
        colmap_io.write_points3D_txt(points3d, model_dir / "points3D.txt")

    return SyntheticScene(
        model_dir=model_dir,
        image_dir=image_dir,
        depth_dir=depth_dir,
        names=names,
        J=J0,
        J_views=J_views,
        B=B,
        beta=beta,
        gamma=gamma,
        width=width,
        height=height,
        poses=poses,
        K=K,
        plane_z=plane_z,
        camera_model=camera_model,
        dist=None if dist_tag == "none" else dist_vec,
        dist_model=dist_tag,
    )
