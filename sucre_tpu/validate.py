"""Dataset pre-flight validation: find problems BEFORE a long survey run.

The reference discovers dataset problems one crash at a time, mid-run
(missing depth map -> FileNotFoundError at sfm.py:111's first touch,
wrong camera model -> assert at sfm.py:192, half-written matches ->
integrity assert). On a 200-image survey that means hours of restarts.
This validator walks the whole dataset up front and reports every
problem at once:

  python -m sucre_tpu.validate --image-dir I --depth-dir D --model-dir M
      [--image-scale S] [--deep] [--num-workers N] [--json out.json]

Checks (fast mode reads file headers only; ``--deep`` fully decodes):
  - COLMAP model parses; camera models are supported (ALL 11 COLMAP
    models: PINHOLE / SIMPLE_PINHOLE, plus the natively-handled
    distorted ones — SIMPLE_RADIAL, RADIAL, OPENCV, FULL_OPENCV,
    OPENCV_FISHEYE, SIMPLE_RADIAL_FISHEYE, RADIAL_FISHEYE, FOV,
    THIN_PRISM_FISHEYE — INFO); intrinsics/poses are finite.
  - Duplicate image names (name-keyed lookups would silently collide).
  - Every registered image has an existing, decodable RGB file and
    depth map (``depth_<stem>.png``, or the natively-read alternatives:
    ``depth_<stem>.npy/.tif/.exr/.bin`` and COLMAP dense
    ``<name>.geometric.bin`` — INFO when used).
  - Depth PNGs are 16-bit (8-bit depth is almost certainly a unit
    mistake: max 255 mm) with dimensions matching the camera.
  - RGB dimensions match the camera (mismatch is legal — the pipeline
    resizes, reference loader.py:158-162 — but disqualifies the raw
    uint8 fast path, so it is surfaced as a warning).
  - ``--deep``: depth maps decode and contain positive depths (a view
    with none contributes zero observations).
  - ``--deep``: depth maps are METRICALLY CONSISTENT with the
    reconstruction itself — triangulated points3D pin the true Z-depth
    at their keypoint pixels, catching unit mistakes, unscaled
    monocular depth, and misaligned/mis-exported maps that every
    per-file check passes (see ``sfm_consistency``); also
    cross-checks point reprojection through the ingested camera model.

Exit code 0 when runnable (warnings allowed), 1 when any ERROR was
found, 2 when the model itself cannot be ingested.
"""

from __future__ import annotations

import argparse
import concurrent.futures as cf
import dataclasses
import json
import struct
import sys
from pathlib import Path

from sucre_tpu.io.depth_formats import ALT_DEPTH_SUFFIXES


@dataclasses.dataclass
class Finding:
    level: str  # "ERROR" | "WARN" | "INFO"
    code: str
    image: str  # image name, or "" for model-level findings
    message: str

    def format(self) -> str:
        where = f" [{self.image}]" if self.image else ""
        return f"{self.level:5s} {self.code}{where}: {self.message}"


def probe_headers(path: Path):
    """(width, height, bit_depth, kind, color_type) from PNG/JPEG file
    headers, or None when the format is neither (the deep pass /
    pipeline decode will still try cv2). Reads at most a few KB.
    ``color_type`` is the PNG IHDR type (0 gray, 2 RGB, 3 palette,
    4 gray+alpha, 6 RGBA; depth maps must be 0) and None for JPEG."""
    # A truncated header (interrupted copy) must degrade to None — the
    # deep pass / pipeline decode reports it properly — hence the broad
    # short-read guards and struct.error/IndexError in the catch.
    try:
        with open(path, "rb") as f:
            head = f.read(32)
            if head[:8] == b"\x89PNG\r\n\x1a\n" and head[12:16] == b"IHDR":
                if len(head) < 25:
                    return None
                w, h = struct.unpack(">II", head[16:24])
                bit_depth = head[24]
                ctype = int(head[25]) if len(head) >= 26 else None
                return int(w), int(h), int(bit_depth), "png", ctype
            if head[:2] == b"\xff\xd8":  # JPEG: walk segments to a SOF
                f.seek(2)
                while True:
                    seg = f.read(4)
                    if len(seg) < 4:
                        return None
                    if seg[0] != 0xFF:
                        return None
                    marker = seg[1]
                    if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                        sof = f.read(5)
                        if len(sof) < 5:
                            return None
                        precision = sof[0]
                        h, w = struct.unpack(">HH", sof[1:5])
                        return int(w), int(h), int(precision), "jpeg", None
                    (seg_len,) = struct.unpack(">H", seg[2:4])
                    if seg_len < 2:
                        return None
                    f.seek(seg_len - 2, 1)
    except (OSError, struct.error, IndexError):
        return None
    return None


def jpeg_components(path: Path) -> int:
    """SOF component count of a JPEG (3 = YCbCr/RGB, 1 = grayscale,
    4 = CMYK/YCCK), 0 when not a JPEG / unparseable. Grayscale and
    YCbCr decode natively (libjpeg converts to RGB); CMYK is NOT a
    libjpeg-convertible source, so those files take the cv2 fallback —
    correct (and reference-identical, the reference decodes via cv2)
    but off the native fast path, worth a pre-flight WARN."""
    try:
        with open(path, "rb") as f:
            if f.read(2) != b"\xff\xd8":
                return 0
            while True:
                seg = f.read(4)
                if len(seg) < 4 or seg[0] != 0xFF:
                    return 0
                marker = seg[1]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    sof = f.read(6)
                    if len(sof) < 6:
                        return 0
                    return sof[5]
                (seg_len,) = struct.unpack(">H", seg[2:4])
                if seg_len < 2:
                    return 0
                f.seek(seg_len - 2, 1)
    except (OSError, struct.error, IndexError):
        return 0


def exif_orientation(path: Path) -> int:
    """EXIF orientation tag (1-8) of a JPEG, 0 when absent / not a JPEG /
    unparseable. Decoders (cv2 AND the native libjpeg path) apply this
    tag, so tags 5-8 swap the displayed dims relative to the SOF header
    — the validator must compare dims in the displayed frame and warn
    that pixels are re-oriented."""
    try:
        with open(path, "rb") as f:
            if f.read(2) != b"\xff\xd8":
                return 0
            while True:
                seg = f.read(4)
                if len(seg) < 4 or seg[0] != 0xFF:
                    return 0
                marker = seg[1]
                if marker == 0xDA:  # start of scan: APP1 would precede it
                    return 0
                (seg_len,) = struct.unpack(">H", seg[2:4])
                if seg_len < 2:
                    return 0
                data = f.read(seg_len - 2)
                if marker != 0xE1 or data[:6] != b"Exif\x00\x00":
                    continue
                t = data[6:]
                if len(t) < 8:
                    return 0
                endian = {b"II": "<", b"MM": ">"}.get(t[:2])
                if endian is None or struct.unpack(endian + "H", t[2:4])[0] != 42:
                    return 0
                (ifd,) = struct.unpack(endian + "I", t[4:8])
                if ifd + 2 > len(t):
                    return 0
                (n,) = struct.unpack(endian + "H", t[ifd:ifd + 2])
                for i in range(n):
                    e = ifd + 2 + 12 * i
                    if e + 12 > len(t):
                        return 0
                    (tag,) = struct.unpack(endian + "H", t[e:e + 2])
                    if tag == 0x0112:
                        (val,) = struct.unpack(endian + "H", t[e + 8:e + 10])
                        return val if 1 <= val <= 8 else 0
                return 0
    except (OSError, struct.error, IndexError):
        return 0


def alt_depth_dims(path: Path) -> tuple[int, int] | None:
    """(width, height) from a COLMAP-dense-.bin or .npy header, None for
    formats without a cheap header read (float TIFF/EXR — the deep pass
    decodes those fully)."""
    try:
        suffix = path.suffix.lower()
        if suffix == ".bin":
            from sucre_tpu.io.depth_formats import read_colmap_array_header

            w, h, _, _ = read_colmap_array_header(path)
            return w, h
        if suffix == ".npy":
            import numpy as np

            with open(path, "rb") as f:
                version = np.lib.format.read_magic(f)
                if version == (1, 0):
                    shape, _, _ = np.lib.format.read_array_header_1_0(f)
                else:
                    shape, _, _ = np.lib.format.read_array_header_2_0(f)
            if len(shape) >= 2:
                return int(shape[1]), int(shape[0])
    except Exception:
        return None
    return None


def _check_view(view, deep: bool, scaled: bool) -> list[Finding]:
    """Per-view checks. ``scaled`` = image_scale != 1: file dims are then
    EXPECTED to differ from the (scaled) camera dims, so dim warnings
    are suppressed."""
    import numpy as np

    findings: list[Finding] = []
    name = view.name

    if not view.rgb_path.is_file():
        findings.append(Finding("ERROR", "rgb-missing", name,
                                f"image file not found: {view.rgb_path}"))
    else:
        probe = probe_headers(view.rgb_path)
        orient = exif_orientation(view.rgb_path)
        if orient > 1:
            findings.append(Finding(
                "WARN", "exif-orientation", name,
                f"EXIF orientation {orient}: pixels are re-oriented at "
                f"decode (cv2/reference parity, native path included) — "
                f"make sure the COLMAP poses and depth maps correspond to "
                f"the RE-ORIENTED image, not the sensor layout"))
        if probe is not None and probe[3] == "jpeg":
            ncomp = jpeg_components(view.rgb_path)
            if ncomp not in (0, 1, 3):
                findings.append(Finding(
                    "WARN", "jpeg-subtype", name,
                    f"JPEG has {ncomp} components (CMYK/YCCK?): decodes "
                    f"via the cv2 fallback (reference-identical colors) "
                    f"but off the native fast path — and one such file "
                    f"demotes the whole batch prefill to cv2"))
        if probe is not None:
            w, h, _, _, _ = probe
            if orient >= 5:
                w, h = h, w  # decoders report/apply the displayed frame
            if (w, h) != (view.width, view.height) and not scaled:
                findings.append(Finding(
                    "WARN", "rgb-dims", name,
                    f"RGB is {w}x{h}, camera is {view.width}x{view.height}; "
                    f"it will be resized (reference parity) but the raw "
                    f"uint8 fast path is disqualified"))
        if deep:
            from sucre_tpu.io.images import load_rgb

            try:
                rgb = load_rgb(view.rgb_path, view.width, view.height)
                if not np.isfinite(rgb).all():
                    findings.append(Finding("ERROR", "rgb-nonfinite", name,
                                            "decoded RGB contains non-finite values"))
            except Exception as e:
                findings.append(Finding("ERROR", "rgb-decode", name,
                                        f"cannot decode {view.rgb_path}: {e}"))

    if not view.depth_path.is_file():
        findings.append(Finding("ERROR", "depth-missing", name,
                                f"depth map not found: {view.depth_path} "
                                f"(expected depth_<stem>.png next to the "
                                f"image's relative path; depth_<stem>"
                                f".npy/.tif/.exr/.bin and COLMAP dense "
                                f"<name>.geometric.bin are also accepted)"))
        return findings

    suffix = view.depth_path.suffix.lower()
    if suffix in ALT_DEPTH_SUFFIXES:
        findings.append(Finding(
            "INFO", "depth-format", name,
            f"depth map is {suffix} (read natively: float sources are "
            f"METERS, quantized to whole millimeters when under 65.535 m "
            f"— reference-PNG-conversion parity; see io/depth_formats.py)"))
        dims = alt_depth_dims(view.depth_path)
        if dims is not None and dims != (view.width, view.height) and not scaled:
            w, h = dims
            findings.append(Finding(
                "WARN", "depth-dims", name,
                f"depth is {w}x{h}, camera is {view.width}x{view.height}; "
                f"INTER_NEAREST resize applies (reference parity) but a "
                f"mismatch usually means the map came from another model"))
    else:
        probe = probe_headers(view.depth_path)
        if probe is not None:
            w, h, bit_depth, kind, ctype = probe
            if kind != "png":
                findings.append(Finding("WARN", "depth-format", name,
                                        f"depth map is {kind}, expected 16-bit PNG"))
            elif bit_depth != 16:
                findings.append(Finding(
                    "WARN", "depth-bitdepth", name,
                    f"depth PNG is {bit_depth}-bit, expected 16-bit millimeters "
                    f"(8-bit caps at 0.255 m — almost certainly a unit mistake)"))
            if kind == "png" and ctype not in (None, 0):
                names = {2: "RGB", 3: "palette", 4: "gray+alpha", 6: "RGBA"}
                findings.append(Finding(
                    "WARN", "depth-channels", name,
                    f"depth PNG is {names.get(ctype, f'type {ctype}')} — "
                    f"expected single-plane grayscale; the decoder collapses "
                    f"multi-channel maps but an exporter that writes depth "
                    f"into one channel of many is a common mistake"))
            if (w, h) != (view.width, view.height) and not scaled:
                findings.append(Finding(
                    "WARN", "depth-dims", name,
                    f"depth is {w}x{h}, camera is {view.width}x{view.height}; "
                    f"INTER_NEAREST resize applies (reference parity) but a "
                    f"mismatch usually means the map came from another model"))
    if deep:
        from sucre_tpu.io.images import depth_to_f32, load_depth_raw

        try:
            # One decode serves both checks: the raw dtype tells the
            # fast-path story, and /1000 on integer sources is exactly
            # load_depth_map's float result (INTER_NEAREST commutes).
            raw = load_depth_raw(view.depth_path, view.width, view.height)
            depth = depth_to_f32(raw)
            if not np.isfinite(depth).all():
                findings.append(Finding("ERROR", "depth-nonfinite", name,
                                        "decoded depth contains non-finite values"))
            else:
                pos = float((depth > 0).mean())
                if pos == 0.0:
                    findings.append(Finding(
                        "WARN", "depth-empty", name,
                        "no positive depths — this view contributes zero "
                        "observations (and is unrestorable as a target)"))
            if suffix in ALT_DEPTH_SUFFIXES:
                # the PNG branch reads bit depth from the header above;
                # alt formats need the STORED dtype (read_depth_any's
                # u16-mm normalization widens narrow integers)
                from sucre_tpu.io.depth_formats import source_dtype

                try:
                    src = source_dtype(view.depth_path)
                except Exception:
                    src = raw.dtype
                if np.issubdtype(src, np.integer) and src.itemsize < 2:
                    findings.append(Finding(
                        "WARN", "depth-bitdepth", name,
                        f"depth {suffix} stores {np.dtype(src).name} "
                        f"millimeters (caps at 0.255 m — almost certainly "
                        f"a unit mistake), expected 16-bit"))
            if suffix in ALT_DEPTH_SUFFIXES and not np.issubdtype(
                raw.dtype, np.integer
            ):
                findings.append(Finding(
                    "WARN", "depth-range", name,
                    f"depths reach {float(depth.max()):.1f} m — beyond "
                    f"uint16 millimeters, so this view stays float32 "
                    f"and its match batches leave the packed "
                    f"single-gather fast path (correct, ~2x slower "
                    f"matching)"))
        except Exception as e:
            findings.append(Finding("ERROR", "depth-decode", name,
                                    f"cannot decode {view.depth_path}: {e}"))
    return findings


def sfm_consistency(
    scene,
    raw_cameras: dict,
    raw_images: dict,
    points3d: dict | None,
    max_samples_per_image: int = 500,
) -> tuple[list[Finding], dict | None]:
    """Depth maps vs the reconstruction itself (``--deep`` only).

    SUCRe's whole geometry rests on a contract the reference never
    checks: the depth PNGs must be METRIC Z-depth in the SAME coordinate
    scale as the COLMAP poses. Monocular-network depth (unknown scale),
    centimeter/meter unit mistakes, or maps exported from a different
    reconstruction all satisfy every per-file check yet silently break
    matching — reprojections land on the wrong pixels and the restored
    output degrades with no error anywhere. The reconstruction carries
    its own oracle: each triangulated point3D observed in an image pins
    the true Z-depth at its keypoint pixel. This pass samples those
    tracks and compares (a) the depth-map value at the keypoint against
    the point's camera-frame Z (``z_map / z_sfm`` ratio — scale/unit
    errors), and (b) the point's reprojection through OUR camera model
    against the stored keypoint (pixel error — pose/intrinsics/lens
    convention mismatches, e.g. a model edited by hand).

    Returns (findings, stats) — stats is None when the model has no
    usable tracks (empty points3D is common for exported models; an INFO
    finding says the check was skipped).
    """
    import numpy as np

    from sucre_tpu.io.images import load_depth_map
    from sucre_tpu.ops import distortion as distortion_ops

    findings: list[Finding] = []
    if not points3d:
        findings.append(Finding(
            "INFO", "sfm-consistency", "",
            "points3D is absent or empty — depth-vs-reconstruction "
            "consistency cannot be checked (only the sparse map carries "
            "independent metric depth evidence)"))
        return findings, None

    xyz = {pid: np.asarray(p.xyz, np.float64) for pid, p in points3d.items()}
    known_ids = np.fromiter(xyz.keys(), np.int64, len(xyz))
    rng = np.random.default_rng(0)
    per_image: list[tuple[str, float, float, int]] = []  # name, ratio, reproj, n
    all_ratios: list[np.ndarray] = []
    all_errs: list[np.ndarray] = []

    # Depth decodes are the dominant cost of this pass; run them on a
    # small thread pool with bounded lookahead so the loop's numpy work
    # overlaps decode instead of serializing a SECOND full-survey decode
    # after _check_view's threaded pass (memory stays ~lookahead maps).
    import concurrent.futures as cf
    from collections import deque

    cand = [
        (iid, im) for iid, im in raw_images.items()
        if scene.views.get(iid) is not None
        and raw_cameras.get(im.camera_id) is not None
        and len(im.point3D_ids) > 0
    ]

    def _decode(v):
        try:
            return load_depth_map(v.depth_path, v.width, v.height)
        except Exception:
            return None  # missing/corrupt depth is already its own finding

    pool = cf.ThreadPoolExecutor(max_workers=4)
    lookahead = 8
    depth_futs: deque = deque()
    submitted = 0

    try:
        for k, (iid, im) in enumerate(cand):
            while submitted < len(cand) and submitted <= k + lookahead:
                depth_futs.append(
                    pool.submit(_decode, scene.views[cand[submitted][0]])
                )
                submitted += 1
            depth_fut = depth_futs.popleft()
            view = scene.views[iid]
            raw_cam = raw_cameras[im.camera_id]
            ids = np.asarray(im.point3D_ids)
            sel = np.flatnonzero((ids >= 0) & np.isin(ids, known_ids))
            if len(sel) == 0:
                depth_fut.cancel()
                continue
            if len(sel) > max_samples_per_image:
                sel = rng.choice(sel, max_samples_per_image, replace=False)
            X = np.stack([xyz[int(p)] for p in np.asarray(im.point3D_ids)[sel]])
            kp = np.asarray(im.xys, np.float64)[sel]
            # keypoints are stored at the ORIGINAL resolution; continuous
            # +0.5-center coords scale linearly with the pixel grid
            kp = kp * [view.width / raw_cam.width, view.height / raw_cam.height]

            # world -> camera through OUR ingested pose (R/t are cam->world)
            R_cw = np.asarray(view.R, np.float64)
            t_cw = np.asarray(view.t, np.float64)
            Pc = (X - t_cw) @ R_cw  # == R_cw.T @ (X - t)
            z_sfm = Pc[:, 2]
            front = z_sfm > 1e-6
            if not front.any():
                depth_fut.cancel()
                continue

            # (b) reprojection through our full camera model (lens included)
            with np.errstate(divide="ignore", invalid="ignore"):
                xn = Pc[:, 0] / np.where(front, z_sfm, 1.0)
                yn = Pc[:, 1] / np.where(front, z_sfm, 1.0)
            if view.dist_model != "none":
                xd, yd = distortion_ops.distort(
                    view.dist_model, np.asarray(view.dist, np.float64), xn, yn,
                    xp=np,
                )
            else:
                xd, yd = xn, yn
            pu = view.fx * xd + view.cx
            pv = view.fy * yd + view.cy
            err = np.hypot(pu - kp[:, 0], pv - kp[:, 1])

            # (a) depth-map Z at the keypoint pixel vs the point's Z
            depth = depth_fut.result()
            if depth is None:
                continue
            ui = np.floor(kp[:, 0]).astype(np.int64)
            vi = np.floor(kp[:, 1]).astype(np.int64)
            inb = (
                front & (ui >= 0) & (ui < view.width) & (vi >= 0) & (vi < view.height)
            )
            z_map = np.where(inb, depth[np.clip(vi, 0, view.height - 1),
                                        np.clip(ui, 0, view.width - 1)], 0.0)
            good = inb & (z_map > 0)
            errs = err[inb & np.isfinite(err)]
            ratios = z_map[good] / z_sfm[good]
            if len(errs):
                all_errs.append(errs)
            if len(ratios):
                all_ratios.append(ratios)
            if len(ratios) >= 20:
                per_image.append((
                    im.name, float(np.median(ratios)),
                    float(np.median(errs)) if len(errs) else float("nan"),
                    len(ratios),
                ))
    finally:
        pool.shutdown(wait=False, cancel_futures=True)

    if not all_ratios:
        findings.append(Finding(
            "INFO", "sfm-consistency", "",
            "no usable point3D tracks land on valid depth pixels — "
            "depth-vs-reconstruction consistency not checked"))
        return findings, None

    ratio = float(np.median(np.concatenate(all_ratios)))
    reproj = float(np.median(np.concatenate(all_errs))) if all_errs else float("nan")
    n = int(sum(len(r) for r in all_ratios))
    stats = {
        "median_depth_ratio": ratio,
        "median_reproj_px": reproj,
        "n_samples": n,
        "n_images": len(per_image),
    }

    if not (0.5 <= ratio <= 2.0):
        findings.append(Finding(
            "ERROR", "depth-scale", "",
            f"depth maps disagree with the reconstruction: median "
            f"z_depthmap/z_points3D = {ratio:.3f} over {n} sampled tracks. "
            f"The pipeline requires metric Z-depth in the model's "
            f"coordinate scale (16-bit millimeters); this looks like a "
            f"unit mistake or unscaled monocular depth — matching would "
            f"silently reproject to wrong pixels"))
    elif not (0.9 <= ratio <= 1.1):
        findings.append(Finding(
            "WARN", "depth-scale", "",
            f"depth maps are {abs(ratio - 1) * 100:.0f}% off the "
            f"reconstruction scale (median z_depthmap/z_points3D = "
            f"{ratio:.3f} over {n} tracks) — expect degraded matching "
            f"consistency near the two-way rounding tolerance"))
    else:
        findings.append(Finding(
            "INFO", "sfm-consistency", "",
            f"depth maps agree with the reconstruction: median "
            f"z_depthmap/z_points3D = {ratio:.3f}, median reprojection "
            f"error {reproj:.2f} px over {n} tracks in "
            f"{len(per_image)} images"))

    if np.isfinite(reproj) and reproj > 2.0:
        findings.append(Finding(
            "WARN", "sfm-reproj", "",
            f"median reprojection error of triangulated points through "
            f"the ingested cameras is {reproj:.2f} px — poses, intrinsics "
            f"or the lens model disagree with the reconstruction's own "
            f"keypoints (hand-edited model? wrong camera file?)"))

    # per-image outliers against the global scale: a single misaligned /
    # mis-exported depth map hides inside a healthy global median
    for name, r_img, e_img, n_img in per_image:
        if ratio != 0 and not (0.8 <= r_img / ratio <= 1.25):
            findings.append(Finding(
                "WARN", "depth-scale", name,
                f"this view's depth is {r_img / ratio:.2f}x the survey's "
                f"global depth/reconstruction ratio ({n_img} tracks) — "
                f"likely a misaligned or mis-exported depth map"))
    return findings, stats


def validate(
    model_dir: Path,
    image_dir: Path,
    depth_dir: Path,
    image_scale: float = 1.0,
    deep: bool = False,
    num_workers: int = 8,
):
    """Run all checks. Returns (findings, summary dict). Raises
    ValueError when the model itself cannot be ingested."""
    import numpy as np

    from sucre_tpu.io import colmap as colmap_io
    from sucre_tpu.scene import Scene

    findings: list[Finding] = []

    try:
        raw_cameras, raw_images, raw_points = colmap_io.read_model(
            model_dir, with_points3D=deep
        )
    except Exception as e:
        raise ValueError(f"COLMAP model at {model_dir} failed to parse: {e}")

    # Duplicate names: views are id-keyed, but every name-keyed lookup
    # (CLI target selection, scene[name]) silently resolves to ONE of the
    # colliding images.
    names_seen: dict[str, int] = {}
    for im in raw_images.values():
        if im.name in names_seen:
            findings.append(Finding(
                "ERROR", "duplicate-name", im.name,
                f"image ids {names_seen[im.name]} and {im.image_id} share "
                f"one name; name-keyed target selection cannot tell them "
                f"apart"))
        else:
            names_seen[im.name] = im.image_id

    # Camera-model / dangling-camera checks run here (not via the Scene
    # ingest's raise) so ONE bad camera reports itself and the rest of
    # the dataset still gets validated — the whole point of pre-flight.
    from sucre_tpu.ops.distortion import COLMAP_DISTORTED_MODELS

    ok_cams = {}
    for cid, cam in raw_cameras.items():
        if cam.model in ("PINHOLE", "SIMPLE_PINHOLE"):
            ok_cams[cid] = cam
        elif cam.model in COLMAP_DISTORTED_MODELS:
            # Supported natively (the reference would reject these —
            # sfm.py:192); surface it so users know the distortion is
            # being modeled rather than silently assumed away.
            ok_cams[cid] = cam
            findings.append(Finding(
                "INFO", "camera-model", "",
                f"camera {cid} uses distorted model {cam.model}: handled "
                f"natively (rays bend through the inverse lens model); the "
                f"PyTorch reference would require COLMAP's image "
                f"undistorter first"))
        else:
            findings.append(Finding(
                "ERROR", "camera-model", "",
                f"camera {cid} uses model {cam.model}; supported models: "
                f"PINHOLE, SIMPLE_PINHOLE, "
                f"{', '.join(COLMAP_DISTORTED_MODELS)} — run COLMAP's "
                f"image undistorter for anything else"))
    ok_images = {}
    for iid, im in raw_images.items():
        if im.camera_id in raw_cameras:
            if im.camera_id in ok_cams:
                ok_images[iid] = im
        else:
            findings.append(Finding(
                "ERROR", "dangling-camera", im.name,
                f"image {iid} references camera {im.camera_id}, which is "
                f"not in cameras.bin/.txt"))

    scene = Scene.from_model_dicts(ok_cams, ok_images, image_dir,
                                   depth_dir, image_scale)

    # Images whose camera was rejected above still get their RGB/depth
    # files checked (paths derive from the name alone; dims from the raw
    # camera) — one camera-model error must not hide per-view findings.
    import types

    rejected_views = []
    for im in raw_images.values():
        cam = raw_cameras.get(im.camera_id)
        if cam is None or im.camera_id in ok_cams:
            continue
        from sucre_tpu.scene import resolve_depth_path

        rejected_views.append(types.SimpleNamespace(
            name=im.name,
            rgb_path=Path(image_dir) / im.name,
            # same lookup the pipeline uses — a rejected camera's depth
            # map may live in an alternative format (.npy/.bin/...)
            depth_path=resolve_depth_path(Path(depth_dir), im.name),
            width=int(cam.width * image_scale),
            height=int(cam.height * image_scale),
        ))

    for v in scene.view_list():
        bad = [x for x in (v.fx, v.fy, v.cx, v.cy) if not np.isfinite(x)]
        if bad or v.fx <= 0 or v.fy <= 0:
            findings.append(Finding("ERROR", "intrinsics", v.name,
                                    f"non-finite or non-positive focal: "
                                    f"fx={v.fx} fy={v.fy} cx={v.cx} cy={v.cy}"))
        if not (np.isfinite(v.R).all() and np.isfinite(v.t).all()):
            findings.append(Finding("ERROR", "pose", v.name,
                                    "non-finite pose"))

    scaled = image_scale != 1.0
    with cf.ThreadPoolExecutor(max_workers=max(1, num_workers)) as pool:
        for sub in pool.map(lambda v: _check_view(v, deep, scaled),
                            scene.view_list() + rejected_views):
            findings.extend(sub)

    sfm_stats = None
    if deep:
        sfm_findings, sfm_stats = sfm_consistency(
            scene, raw_cameras, raw_images, raw_points
        )
        findings.extend(sfm_findings)

    dims: dict[tuple[int, int], int] = {}
    for v in scene.view_list():
        dims[(v.width, v.height)] = dims.get((v.width, v.height), 0) + 1
    n_err = sum(1 for f in findings if f.level == "ERROR")
    n_warn = sum(1 for f in findings if f.level == "WARN")
    summary = {
        "n_views": len(scene),
        "dims": {f"{w}x{h}": c for (w, h), c in sorted(dims.items())},
        "image_scale": image_scale,
        "deep": deep,
        "n_errors": n_err,
        "n_warnings": n_warn,
        "sfm_consistency": sfm_stats,
        "findings": [dataclasses.asdict(f) for f in findings],
    }
    return findings, summary


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Validate a SUCRe dataset (COLMAP model + images + "
                    "depth maps) before running restorations.",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("--image-dir", required=True, type=Path)
    p.add_argument("--depth-dir", required=True, type=Path)
    p.add_argument("--model-dir", required=True, type=Path)
    p.add_argument("--image-scale", type=float, default=1.0)
    p.add_argument("--deep", action="store_true",
                   help="fully decode every image and depth map (slower; "
                        "also checks decodability and positive depths)")
    p.add_argument("--num-workers", type=int, default=8)
    p.add_argument("--json", type=Path, default=None,
                   help="also write the machine-readable report here")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    try:
        findings, summary = validate(
            args.model_dir, args.image_dir, args.depth_dir,
            image_scale=args.image_scale, deep=args.deep,
            num_workers=args.num_workers,
        )
    except Exception as e:
        # a validator must never traceback on a broken dataset
        print(f"FATAL: {e}")
        return 2
    for f in findings:
        print(f.format())
    dims = ", ".join(f"{k} x{v}" for k, v in summary["dims"].items())
    print(f"{summary['n_views']} views ({dims}); "
          f"{summary['n_errors']} errors, {summary['n_warnings']} warnings"
          + ("" if args.deep else " (header checks only; --deep decodes)"))
    if args.json is not None:
        args.json.parent.mkdir(parents=True, exist_ok=True)
        args.json.write_text(json.dumps(summary, indent=1))
        print(f"Report: {args.json}")
    return 1 if summary["n_errors"] else 0


if __name__ == "__main__":
    sys.exit(main())
