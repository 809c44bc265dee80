"""Test shim: the synthetic scene generator lives in sucre_tpu.synth."""

from sucre_tpu.synth import SyntheticScene, make_scene, texture, _rotmat_to_qvec  # noqa: F401
