"""Pallas TPU kernels for the hot paths."""

from __future__ import annotations


def select_fit_kernel(params, obs, cfg, *, chunked: bool, unsharded: bool,
                      what: str) -> str:
    """Shared fused-kernel routing for solve.fit / fit_many / fit_joint.

    Returns the pallas mode string: ``"off"``, ``"tpu"``/``"interpret"``
    (no-light kernel) or ``"light-tpu"``/``"light-interpret"``.

    Eligibility (identical across the three fit entry points): direct
    mode, unchunked views, single-device/meshless stack; the no-light
    kernel needs the compact z layout, the light kernel the full cP
    layout. ``cfg.use_pallas`` tri-state: None = auto (kernel on TPU
    only), True = force (raises when ineligible, with ``what`` naming
    the fit in the message), False = off.
    """
    import jax

    from sucre_tpu.ops.pallas.fit_kernel import kernel_supported
    from sucre_tpu.ops.pallas.light_kernel import light_kernel_supported

    light = params.cam2light is not None
    common = (
        not cfg.use_closed_form
        and params.J is not None
        and not chunked
        and unsharded
    )
    if light:
        eligible = (
            common
            and obs.cP is not None
            and light_kernel_supported(obs.valid.shape[-1])
        )
    else:
        eligible = (
            common and obs.z is not None and kernel_supported(obs.valid.shape[-1])
        )
    use_pallas = getattr(cfg, "use_pallas", None)
    if use_pallas is None:
        want = eligible and jax.default_backend() == "tpu"
    else:
        if use_pallas and not eligible:
            raise ValueError(
                f"use_pallas=True but no fused kernel is eligible for this "
                f"{what} (needs: direct mode, unchunked views, "
                f"single-device/meshless stack; compact z-layout without "
                f"the light model, full cP layout with it); use "
                f"use_pallas=None for auto"
            )
        want = use_pallas and eligible
    if not want:
        return "off"
    kind = "light-" if light else ""
    backend = "tpu" if jax.default_backend() == "tpu" else "interpret"
    return f"{kind}{backend}"
