"""Packaging: the repo builds into a wheel whose installed package,
console entry points, and demo actually run (VERDICT r2: a product, not
a checkout). A nested venv can't see this environment's site-packages,
so the wheel is installed with ``pip install --target`` and run with the
current interpreter: the package under test comes from the WHEEL (cwd
and PYTHONPATH exclude the checkout), dependencies from the environment
(``--no-deps`` keeps the test network-free)."""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def _clean_env(site: Path):
    # the device-tunnel sitecustomize breaks subprocess JAX; force CPU.
    # PYTHONPATH is ONLY the wheel-install target: the checkout must not
    # be importable, or the test would pass on a broken wheel.
    env = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("PALLAS_AXON", "AXON")) and k != "PYTHONPATH"
    }
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = str(site)
    return env


@pytest.fixture(scope="module")
def install(tmp_path_factory):
    """Build the wheel, install it into a --target dir; returns
    (site_dir, bin_dir)."""
    root = tmp_path_factory.mktemp("install")
    dist = root / "dist"
    r = subprocess.run(
        [sys.executable, "-m", "pip", "wheel", "--quiet", "--no-deps",
         "--no-build-isolation", "-w", str(dist), str(REPO)],
        capture_output=True, text=True, cwd=str(root),
    )
    assert r.returncode == 0, f"wheel build failed:\n{r.stderr[-2000:]}"
    wheels = list(dist.glob("sucre_tpu-*.whl"))
    assert len(wheels) == 1, [w.name for w in wheels]
    site = root / "site"
    r = subprocess.run(
        [sys.executable, "-m", "pip", "install", "--quiet", "--no-deps",
         "--target", str(site), str(wheels[0])],
        capture_output=True, text=True, cwd=str(root),
    )
    assert r.returncode == 0, f"wheel install failed:\n{r.stderr[-2000:]}"
    return site, site / "bin"


def test_console_entry_point(install, tmp_path):
    site, bin_dir = install
    r = subprocess.run(
        [str(bin_dir / "sucre-tpu"), "--help"],
        capture_output=True, text=True, env=_clean_env(site),
        cwd=str(tmp_path), timeout=120,
    )
    assert r.returncode == 0, r.stderr[-1000:]
    for flag in ("--image-dir", "--depth-dir", "--model-dir", "--image-name"):
        assert flag in r.stdout


def test_demo_runs_from_install(install, tmp_path):
    site, bin_dir = install
    r = subprocess.run(
        [str(bin_dir / "sucre-tpu-demo"), "--output-dir", str(tmp_path / "d"),
         "--views", "4", "--size", "48x32", "--num-iter", "5",
         "--platform", "cpu"],
        capture_output=True, text=True, env=_clean_env(site),
        cwd=str(tmp_path), timeout=600,
    )
    assert r.returncode == 0, (r.stdout + r.stderr)[-2000:]
    assert list((tmp_path / "d" / "restored").glob("*_rgb.png"))


def test_installed_package_is_the_wheel_not_the_checkout(install, tmp_path):
    site, _ = install
    r = subprocess.run(
        [sys.executable, "-c",
         "import sucre_tpu, sys; print(sucre_tpu.__file__)"],
        capture_output=True, text=True, env=_clean_env(site),
        cwd=str(tmp_path), timeout=120,
    )
    assert r.returncode == 0, r.stderr[-1000:]
    assert str(site) in r.stdout, r.stdout


def test_wheel_ships_native_fast_paths(install, tmp_path):
    """On a toolchain-equipped host (this image: g++ + libpng/libjpeg)
    the wheel must CONTAIN the native shared object and the installed
    package must load it — the fast paths may not silently vanish from a
    pip install (setup.py's optional skip is for hosts without the
    toolchain, where the Python fallbacks take over)."""
    site, _ = install
    so = site / "sucre_tpu" / "io" / "libsucre_native.so"
    assert so.exists(), (
        "wheel built where csrc compiles must ship "
        "sucre_tpu/io/libsucre_native.so"
    )
    # the installed package (no checkout csrc/ on the path) finds and
    # exercises ITS OWN .so
    code = (
        "import numpy as np, cv2, tempfile\n"
        "from sucre_tpu.io import native\n"
        "assert native.available(), 'wheel .so not found by io.native'\n"
        "d = (np.arange(12, dtype=np.uint16).reshape(3, 4) * 100)\n"
        "p = tempfile.mktemp(suffix='.png')\n"
        "cv2.imwrite(p, d)\n"
        "out = native.decode_depth_png16(p, 4, 3)\n"
        "assert (out == d).all()\n"
        "print('NATIVE_OK')\n"
    )
    r = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, env=_clean_env(site),
        cwd=str(tmp_path), timeout=120,
    )
    assert r.returncode == 0 and "NATIVE_OK" in r.stdout, (
        r.stdout + r.stderr
    )[-2000:]


def test_declared_dependencies_cover_runtime_imports():
    """Every third-party module sucre_tpu imports unconditionally must be
    a declared dependency (a wheel that cannot import is not a product)."""
    import tomllib

    meta = tomllib.loads((REPO / "pyproject.toml").read_text())
    deps = " ".join(meta["project"]["dependencies"])
    for mod, pkg in [
        ("jax", "jax"), ("numpy", "numpy"), ("cv2", "opencv-python-headless"),
        ("h5py", "h5py"), ("optax", "optax"), ("PIL", "pillow"),
    ]:
        assert pkg in deps, f"{mod} is imported but {pkg} is not declared"
    extras = meta["project"]["optional-dependencies"]
    assert "torch" in " ".join(extras["interop"])
    assert "matplotlib" in " ".join(extras["viz"])
