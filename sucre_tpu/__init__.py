"""sucre_tpu — TPU-native multi-view underwater color restoration.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the SUCRe
reference pipeline (clementinboittiaux/sucre): ingest a COLMAP PINHOLE
model + per-image dense depth maps, build dense cross-view pixel
correspondences by two-way reprojection consistency, and fit the
underwater image-formation model

    I = J * exp(-beta * z) + B * (1 - exp(-gamma * z))

(optionally with an artificial-light / vignetting model) per image by
full-batch nonlinear least squares, recovering the restored image J and
the water parameters B (backscatter veil), beta (attenuation) and gamma
(backscatter coefficient).

Architecture (TPU-first, not a port):
  - ``ops/``      pure-JAX geometry + matching + formation primitives,
                  Pallas kernels for the hot paths.
  - ``models/``   the SUCRe image-formation model as a functional pytree
                  (params, observations) -> loss / restored image.
  - ``parallel/`` device-mesh and sharding helpers (pjit over views x
                  pixel-rows, multi-target data parallelism).
  - ``io/``       COLMAP bin/txt ingest (own parser; C++ fast path),
                  image/depth decode with host-side prefetch.
  - ``store``     matches cache (HDF5, schema-compatible with the
                  reference) + dense observation stacks.
  - ``solve``     full-batch Adam on device (lax.scan), sharded.
  - ``cli``       the reference-compatible command-line surface.

Observations are laid out *dense on the target pixel grid*: a
(V, H, W) stack where entry [k, v, u] is view k's observation of target
pixel (u, v). This removes every gather/scatter from the fit stage — the
per-pixel least squares becomes pure elementwise math + reductions over
the view axis, which XLA fuses into a handful of HBM-bandwidth-bound
passes, and which shards trivially over (views, rows) meshes.
"""

__version__ = "0.1.0"

# Lazy top-level conveniences (import jax only when first used):
#   from sucre_tpu import Scene, RestoreConfig, restore_image, restore_survey
_API = {
    "Scene": ("sucre_tpu.scene", "Scene"),
    "RestoreConfig": ("sucre_tpu.pipeline", "RestoreConfig"),
    "RestoreResult": ("sucre_tpu.pipeline", "RestoreResult"),
    "NoObservationsError": ("sucre_tpu.pipeline", "NoObservationsError"),
    "restore_image": ("sucre_tpu.pipeline", "restore_image"),
    "restore_many": ("sucre_tpu.pipeline", "restore_many"),
    "restore_survey": ("sucre_tpu.pipeline", "restore_survey"),
    "dispatch_survey_batch": ("sucre_tpu.pipeline", "dispatch_survey_batch"),
    "BatchInFlight": ("sucre_tpu.pipeline", "BatchInFlight"),
    "FitConfig": ("sucre_tpu.solve", "FitConfig"),
    "fit": ("sucre_tpu.solve", "fit"),
    "validate_dataset": ("sucre_tpu.validate", "validate"),
    "read_mesh": ("sucre_tpu.io.mesh", "read_mesh"),
    "render_view_depth": ("sucre_tpu.depth_from_mesh", "render_view_depth"),
    "generate_depth_maps": ("sucre_tpu.depth_from_mesh", "generate_depth_maps"),
}
__all__ = ["__version__", *_API]


def __getattr__(name: str):
    try:
        module, attr = _API[name]
    except KeyError:
        raise AttributeError(f"module 'sucre_tpu' has no attribute {name!r}") from None
    import importlib

    return getattr(importlib.import_module(module), attr)
