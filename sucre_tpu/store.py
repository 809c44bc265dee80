"""Matches cache + observation-stack assembly.

Lifecycle parity with the reference (sucre.py:160-219, loader.py:56-130):
``<output>/<image_name>.h5`` holds one group per paired image with
datasets ``u1 v1 u2 v2`` (int16), ``d`` (float32 view-2 depth at the
matched pixel) and ``I`` ((3, N) float32 matched colors) — byte-level
schema-compatible with files written by the reference, so caches are
interchangeable. Exists => matching is skipped; ``overwrite`` unlinks;
``check_integrity`` applies the reference's NaN/range asserts
(loader.py:89-101); callers delete the file after a successful restore
unless ``keep``.

Where the reference loads packed per-pair tensors and concatenates them
per batch (loader.py:33-53), this store *rasterizes* the packed matches
back onto the target pixel grid into the dense (V, H, W) ``DenseObs``
stack (indices are unique per pair by construction) — the fit stage's
native layout.
"""

from __future__ import annotations

from pathlib import Path

import h5py
import numpy as np

from sucre_tpu.ops.matching import DenseObs, PairMatch


def _unproject_np(intr: np.ndarray, u, v, d,
                  dist=None, dist_model: str = "none") -> np.ndarray:
    """Host-side unproject (same convention as ops.pinhole.unproject):
    parity with loader.py:103-118 where cP is rebuilt at load time.
    Distorted cameras route through the canonical inverse lens model
    (f32, matching the device path's precision)."""
    if dist_model != "none":
        from sucre_tpu.ops.distortion import unproject_dist

        return unproject_dist(
            np.asarray(intr, np.float32), np.asarray(dist, np.float32),
            dist_model, u, v, d.astype(np.float32), xp=np,
        )
    fx, fy, cx, cy = (np.float32(x) for x in intr)
    u = u.astype(np.float32)
    v = v.astype(np.float32)
    d = d.astype(np.float32)
    X = d * (u + np.float32(0.5) - cx) / fx
    Y = d * (v + np.float32(0.5) - cy) / fy
    return np.stack([X, Y, d], axis=-1)


def _leaf_groups(f):
    """Yield (image_name, group) for every pair group in iteration order.

    Image names containing subdirectories ('cam0/img.png') become NESTED
    h5 groups when written (h5py splits on '/'), so readers walk the
    tree and reassemble the full name; a pair group is recognized by its
    'u1' dataset. Flat files iterate exactly as before (alphabetical
    top-level groups — matching the reference's ``f.items()``)."""

    def walk(g, prefix):
        for key in g:
            item = g[key]
            if isinstance(item, h5py.Group):
                name = f"{prefix}{key}"
                # A pair group holds a 'u1' DATASET; an image literally
                # named '<dir>/u1' appears here as a 'u1' SUBGROUP, so a
                # bare membership test would misclassify its parent.
                if isinstance(item.get("u1"), h5py.Dataset):
                    yield name, item
                else:
                    yield from walk(item, name + "/")

    yield from walk(f, "")


class MatchesFile:
    """HDF5-backed per-target matches DB (see module docstring)."""

    def __init__(self, path: Path | str, *, overwrite: bool = False):
        self.path = Path(path)
        if overwrite:
            self.path.unlink(missing_ok=True)

    def set_color_sampling(self, mode: str) -> None:
        """Tag the cache with its color-sampling mode ('nearest' is the
        reference default and the implied value when the attribute is
        absent — reference-written caches remain readable)."""
        self.path.parent.mkdir(parents=True, exist_ok=True)
        with h5py.File(self.path, "a", libver="latest") as f:
            f.attrs["color_sampling"] = mode

    def color_sampling(self) -> str:
        if not self.path.exists():
            return "nearest"
        with h5py.File(self.path, "r", libver="latest") as f:
            return str(f.attrs.get("color_sampling", "nearest"))

    def check_color_sampling(self, bilinear: bool) -> None:
        """Refuse to reuse a cache whose colors were sampled in the other
        mode (the observation geometry matches; the colors don't)."""
        want = "bilinear" if bilinear else "nearest"
        got = self.color_sampling()
        if got != want:
            raise RuntimeError(
                f"{self.path} was computed with {got} color sampling but "
                f"this run requests {want}; pass --force-compute-matches "
                f"to recompute"
            )

    def exists(self) -> bool:
        return self.path.exists()

    def is_complete(self) -> bool:
        """True when the cache finished writing. Pairs are appended
        incrementally during matching, so a killed run leaves a partial
        file that a bare exists() gate would treat as complete; our
        writer stamps ``complete=False`` at creation (save_pair) and
        flips it in finalize(). Files WITHOUT the writer stamp (written
        by the reference implementation) are accepted as complete — the
        reference has no such marker."""
        if not self.path.exists():
            return False
        try:
            with h5py.File(self.path, "r", libver="latest") as f:
                if "writer" not in f.attrs:
                    return True
                return bool(f.attrs.get("complete", False))
        except OSError:
            # unreadable/corrupt HDF5 (e.g. killed inside h5py's write
            # window) IS the incomplete case this gate exists for
            return False

    def discard_if_incomplete(self) -> bool:
        """Unlink a partial cache from a killed run (exists but not
        complete); returns True when one was discarded so the caller can
        log it. The single gate both restore paths share."""
        if self.path.exists() and not self.is_complete():
            self.path.unlink()
            return True
        return False

    def finalize(self) -> None:
        """Mark the cache complete (call when matching finished)."""
        if self.path.exists():
            with h5py.File(self.path, "a", libver="latest") as f:
                f.attrs["complete"] = True

    def check_grid(self, height: int, width: int) -> None:
        """Refuse to reuse a cache written for a different target grid
        (e.g. a different --image-scale): the stored pixel coordinates
        are meaningless on another grid. Reference-written caches carry
        no dims attrs and pass (load_dense still bounds-checks)."""
        if not self.path.exists():
            return
        with h5py.File(self.path, "r", libver="latest") as f:
            got = (f.attrs.get("height"), f.attrs.get("width"))
        if got[0] is None:
            return
        if (int(got[0]), int(got[1])) != (height, width):
            raise RuntimeError(
                f"{self.path} was computed on a {got[0]}x{got[1]} target "
                f"grid but this run restores at {height}x{width} (check "
                f"--image-scale); pass --force-compute-matches to recompute"
            )

    def pair_names(self) -> list[str]:
        with h5py.File(self.path, "r", libver="latest") as f:
            return [name for name, _ in _leaf_groups(f)]

    def save_pair(
        self,
        image2_name: str,
        u1: np.ndarray,
        v1: np.ndarray,
        u2: np.ndarray,
        v2: np.ndarray,
        d: np.ndarray,
        I: np.ndarray,  # (N, 3) observations-major
        grid_hw: tuple[int, int] | None = None,  # target (H, W), stamped
        # as dims attrs at creation so check_grid can refuse cross-scale
        # reuse
    ) -> None:
        """Append one paired image's packed matches (reference schema:
        loader.py:68-76 — int16 coords, (3, N) float32 colors).

        ``I`` must be (N, 3): requiring one explicit orientation avoids
        the N == 3 ambiguity a shape heuristic cannot resolve (a
        transposed 3x3 color block would corrupt the cache silently)."""
        I = np.asarray(I, np.float32)
        if I.ndim != 2 or I.shape[1] != 3 or I.shape[0] != len(np.asarray(u1)):
            raise ValueError(f"I must be (N, 3) observations-major, got {I.shape}")
        I = I.T  # stored channels-first per the reference schema
        self.path.parent.mkdir(parents=True, exist_ok=True)
        with h5py.File(self.path, "a", libver="latest") as f:
            if "writer" not in f.attrs:
                # crash-consistency stamp: a file that never reaches
                # finalize() is discarded on reuse, not half-loaded
                f.attrs["writer"] = "sucre_tpu"
                f.attrs["complete"] = False
                if grid_hw is not None:
                    f.attrs["height"], f.attrs["width"] = (
                        int(grid_hw[0]), int(grid_hw[1]),
                    )
            group = f.create_group(image2_name)
            group.create_dataset("u1", data=np.asarray(u1, np.int16))
            group.create_dataset("v1", data=np.asarray(v1, np.int16))
            group.create_dataset("u2", data=np.asarray(u2, np.int16))
            group.create_dataset("v2", data=np.asarray(v2, np.int16))
            group.create_dataset("d", data=np.asarray(d, np.float32))
            group.create_dataset("I", data=I)

    def save_pair_from_dense(self, image2_name: str, match: PairMatch, I_dense) -> int:
        """Pack a dense-on-target-grid PairMatch (+ dense colors) and save.
        Returns the number of matches saved."""
        valid = np.asarray(match.valid)
        v1, u1 = np.nonzero(valid)
        u2 = np.asarray(match.u2)[v1, u1]
        v2 = np.asarray(match.v2)[v1, u1]
        d = np.asarray(match.d2)[v1, u1]
        I = np.asarray(I_dense)[v1, u1]
        if np.issubdtype(I.dtype, np.integer):
            I = (I / 255).astype(np.float32)  # h5 schema stores float colors
        self.save_pair(image2_name, u1, v1, u2, v2, d, I, grid_hw=valid.shape)
        return len(u1)

    def check_integrity(self) -> None:
        """Reference integrity gate (loader.py:89-101): no NaNs anywhere,
        non-negative coords/colors, strictly positive depths."""
        with h5py.File(self.path, "r", libver="latest") as f:
            for _, group in _leaf_groups(f):
                for name in ["u1", "v1", "u2", "v2", "d", "I"]:
                    data = group[name][()]
                    assert not np.isnan(data).any(), (
                        f"In {self.path}, dataset {group.name}/{name} contains NaN(s)."
                    )
                    if name in ["u1", "v1", "u2", "v2", "I"]:
                        assert np.all(data >= 0), (
                            f"In {self.path}, dataset {group.name}/{name} contains "
                            f"invalid value(s)."
                        )
                    if name == "d":
                        assert np.all(data > 0), (
                            f"In {self.path}, dataset {group.name}/{name} contains "
                            f"null or negative depth(s)."
                        )

    def __len__(self) -> int:
        if not self.path.exists():
            return 0
        size = 0
        with h5py.File(self.path, "r", libver="latest") as f:
            for _, group in _leaf_groups(f):
                size += group["u1"].shape[0]
        return size

    def load_dense(
        self, scene, height: int, width: int, compact: bool = False
    ) -> tuple[DenseObs, list[str]]:
        """Rasterize the packed matches onto the target grid.

        ``scene`` provides per-pair-view intrinsics (cP is rebuilt from
        (u2, v2, d) in the observing camera's frame — loader.py:103-118).
        Groups are iterated in h5py order (alphabetical), matching the
        reference's ``f.items()`` iteration.

        ``compact=True`` builds the no-light z layout HOST-side
        (z = ||cP||, DenseObs.compact()) so the upload moves a (V, H, W)
        range stack instead of the 3x larger cP stack — the resume path
        would otherwise pay the full cP host->device transfer only to
        immediately reduce it on device.
        """
        names: list[str] = []
        with h5py.File(self.path, "r", libver="latest") as f:
            groups = list(_leaf_groups(f))
            names = [n for n, _ in groups]
            V = len(names)
            valid = np.zeros((V, height, width), bool)
            cP = (
                None if compact
                else np.zeros((V, height, width, 3), np.float32)
            )
            z = np.zeros((V, height, width), np.float32) if compact else None
            I = np.zeros((V, height, width, 3), np.float32)
            for k, (name, g) in enumerate(groups):
                u1 = g["u1"][()].astype(np.int64)
                v1 = g["v1"][()].astype(np.int64)
                u2 = g["u2"][()].astype(np.int64)
                v2 = g["v2"][()].astype(np.int64)
                d = g["d"][()]
                Ik = g["I"][()]  # (3, N)
                view2 = scene[name]
                # Bounds gate before fancy indexing: negative or
                # out-of-grid coords (corrupt cache, or one written at a
                # different --image-scale) would otherwise wrap to the
                # far edge / raise a raw IndexError and rasterize
                # observations onto wrong pixels.
                if len(u1) and not (
                    (u1 >= 0).all() and (u1 < width).all()
                    and (v1 >= 0).all() and (v1 < height).all()
                ):
                    raise RuntimeError(
                        f"{self.path}: group {name} has target coords "
                        f"outside the {height}x{width} grid — the cache "
                        f"is corrupt or was written at a different "
                        f"--image-scale; pass --force-compute-matches"
                    )
                valid[k, v1, u1] = True
                cPk = _unproject_np(
                    view2.intrinsics, u2, v2, d,
                    dist=getattr(view2, "dist", None),
                    dist_model=getattr(view2, "dist_model", "none"),
                )
                if compact:
                    # f32 accumulate + sqrt: matches the device-side
                    # DenseObs.compact() reduction bit-for-bit
                    z[k, v1, u1] = np.sqrt(
                        np.sum(cPk * cPk, axis=-1, dtype=np.float32)
                    ).astype(np.float32)
                else:
                    cP[k, v1, u1] = cPk
                I[k, v1, u1] = Ik.T
        import jax.numpy as jnp

        return (
            DenseObs(
                valid=jnp.asarray(valid),
                cP=None if compact else jnp.asarray(cP),
                I=jnp.asarray(I),
                z=jnp.asarray(z) if compact else None,
            ),
            names,
        )


