"""Optional native-layer build for the wheel.

The package is pure Python with ctypes-loaded native fast paths: the
csrc/ C++ sources (COLMAP .bin reader, libjpeg/libpng codec, mesh depth
rasterizer) compile into one plain shared object that ``io/native.py``
dlopens — every entry point has a Python/cv2 fallback, so the extension
is strictly optional. The reference ships its native muscle via
dependencies (requirements.txt:1-6 — torch/pycolmap/opencv wheels); ours
is first-party, so the wheel build compiles it when a C++ toolchain and
the libpng/libjpeg headers are present and SKIPS WITH A WARNING when
they are not (``optional=True``): ``pip install .`` never fails for lack
of a toolchain, it just falls back to the slower pure-Python paths.

Metadata lives in pyproject.toml; this file only adds the extension.
"""

import os

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class BuildSharedLib(build_ext):
    """Build libsucre_native as a plain C-ABI shared object (not a
    CPython extension module): io/native.py loads it with ctypes, so the
    filename must stay ``libsucre_native.so`` — no ABI tag."""

    def get_ext_filename(self, fullname):
        if fullname.endswith("libsucre_native"):
            return os.path.join(*fullname.split(".")) + ".so"
        return super().get_ext_filename(fullname)

    def get_export_symbols(self, ext):
        return []  # no PyInit_*: this is not an importable module


_native = Extension(
    # lands at sucre_tpu/io/libsucre_native.so — the second entry of
    # io/native.py's search path (the first is the csrc/ dev build)
    "sucre_tpu.io.libsucre_native",
    sources=[
        "csrc/colmap_reader.cpp",
        "csrc/image_codec.cpp",
        "csrc/depth_raster.cpp",
    ],
    libraries=["png", "jpeg", "pthread"],
    extra_compile_args=["-O2", "-std=c++17", "-fPIC"],
    language="c++",
    optional=True,  # missing toolchain/headers -> warn and skip, never fail
)

setup(ext_modules=[_native], cmdclass={"build_ext": BuildSharedLib})
