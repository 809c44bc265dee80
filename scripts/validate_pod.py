"""One-command pod validation: the multi-chip correctness + communication
claims, runnable on REAL hardware the day a slice is available.

Runs, on every device JAX can see (or a virtual CPU mesh with
--virtual N when no multi-chip hardware exists):

  1. equal-output: sharded matching (view x row mesh) == unsharded
  2. equal-output: sharded fit (view x row mesh) == unsharded
  3. equal-output: batch shard mode (one target per chip) == unsharded
  4. HLO proof: the sharded matching program is communication-free
     (its only collective is the tiny (T, V) min-cover count psum)
  5. HLO proof: the compiled fit program contains NO all-gather /
     all-to-all / collective-permute / reduce-scatter; on a 1xN row
     mesh its dJ all-reduce compiles to singleton replica groups
     (zero bytes moved per iteration)
  6. measured aggregate throughput: the bench-shaped device-only
     workload under --shard-mode batch, reported as Mpix/s across the
     whole mesh (real ICI when run on hardware)

Usage:
    python scripts/validate_pod.py              # real devices (a pod)
    python scripts/validate_pod.py --virtual 8  # 8-device virtual CPU mesh
    python scripts/validate_pod.py --skip-bench # claims only, no timing

Exits non-zero on any failed check; prints one JSON summary line last.
SURVEY.md §2.3 / BASELINE.md "North-star accounting" are the claims this
script makes verifiable in one command.
"""

import argparse
import json
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))


def collective_inventory(hlo: str):
    """(op, n_elements, max_replica_group_size) for every collective."""
    import numpy as np

    out = []
    for m in re.finditer(
        r"= \S*?\[([\d,]*)\][^\n]*?\b(all-reduce|all-gather|all-to-all|"
        r"collective-permute|reduce-scatter)(?:-start)?\([^\n]*",
        hlo,
    ):
        line, shape = m.group(0), m.group(1)
        n = int(np.prod([int(d) for d in shape.split(",")])) if shape else 1
        gsz = 0
        g = re.search(r"replica_groups=\{\{(.*?)\}\}", line)
        if g:
            gsz = max(len(grp.split(",")) for grp in g.group(1).split("},{"))
        else:
            g = re.search(r"replica_groups=\[\d+,(\d+)\]<=", line)
            if g:
                gsz = int(g.group(1))
        out.append((m.group(2), n, gsz))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--virtual", type=int, default=None, metavar="N",
                    help="provision an N-device virtual CPU platform "
                         "(validation without multi-chip hardware)")
    ap.add_argument("--skip-bench", action="store_true",
                    help="run only the correctness/HLO checks")
    args = ap.parse_args()

    import jax

    if args.virtual:
        jax.config.update("jax_num_cpu_devices", args.virtual)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir",
        str(Path(__file__).parent.parent / ".jax_cache"),
    )

    import functools

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    n = len(jax.devices())
    print(f"devices: {n} x {jax.devices()[0].platform}", file=sys.stderr)
    if n < 2:
        print(
            "Only one device visible — run on a pod, or pass --virtual 8.",
            file=sys.stderr,
        )
        return 2

    from sucre_tpu.models.sucre import init_params
    from sucre_tpu.ops.matching import match_survey
    from sucre_tpu.parallel import (
        fit_sharded, make_mesh, match_survey_sharded,
    )
    from sucre_tpu.solve import FitConfig, fit

    results: dict = {"devices": n, "platform": jax.devices()[0].platform}
    failures: list[str] = []

    def check(name, fn):
        t0 = time.perf_counter()
        try:
            extra = fn() or {}
            results[name] = {"ok": True, **extra}
            print(f"[ok] {name} ({time.perf_counter() - t0:.1f}s)",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — report every failure
            failures.append(name)
            results[name] = {"ok": False, "error": f"{type(e).__name__}: {e}"}
            print(f"[FAIL] {name}: {e}", file=sys.stderr)

    # factor the mesh as close to square as the device count allows
    vs = 1
    for f in range(int(n ** 0.5), 0, -1):
        if n % f == 0:
            vs = f
            break
    rs = n // vs
    mesh_vr = make_mesh(vs, rs)
    mesh_row = make_mesh(1, n)

    # a small but non-trivial synthetic survey (shared by checks 1-3)
    rng = np.random.default_rng(0)
    V, T, H, W = 8, 4, 48, 64
    depths = (
        rng.uniform(1500, 2500, (V, H, W)) * (rng.uniform(size=(V, H, W)) < 0.9)
    ).astype(np.uint16)
    rgbs = rng.integers(0, 256, (V, H, W, 3), dtype=np.uint8)
    intrs = np.tile(np.array([40.0, 40.0, W / 2, H / 2], np.float32), (V, 1))
    Rs = np.tile(np.eye(3, dtype=np.float32), (V, 1, 1))
    ts = np.stack([np.array([0.05 * k, 0, 0], np.float32) for k in range(V)])
    j = jnp.asarray
    margs = (j(depths[:T]), j(intrs[:T]), j(Rs[:T]), j(ts[:T]),
             j(depths), j(rgbs), j(intrs), j(Rs), j(ts))

    obs_ref = match_survey(*margs, jnp.float32(1e-6))

    def check_match_sharded():
        obs_sh = match_survey_sharded(mesh_vr, *margs)
        Hs = obs_sh.valid.shape[2]
        o = jax.tree.map(lambda x: x[:, :V, :H] if x.shape[2] == Hs else x,
                         obs_sh)
        for f in ("valid", "z", "I"):
            np.testing.assert_array_equal(
                np.asarray(getattr(obs_ref, f)),
                np.asarray(getattr(o, f)[:, :V]), err_msg=f,
            )
        return {"mesh": f"{vs}x{rs}"}

    check("match_sharded_equals_unsharded", check_match_sharded)

    img = rng.uniform(0, 1, (H, W, 3)).astype(np.float32)
    cfg = FitConfig(num_iter=10)
    obs_one = jax.tree.map(lambda x: x[0], obs_ref)

    def check_fit_sharded():
        r_ref = fit(init_params(image=img), obs_one, cfg)
        r_sh = fit_sharded(init_params(image=img), obs_one, cfg, mesh_vr)
        np.testing.assert_allclose(
            np.asarray(r_ref.J), np.asarray(r_sh.J), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(r_ref.params.B), np.asarray(r_sh.params.B), atol=1e-6
        )
        return {"mesh": f"{vs}x{rs}"}

    check("fit_sharded_equals_unsharded", check_fit_sharded)

    def check_fit_many_batch():
        from sucre_tpu.parallel import fit_many, stack_obs, stack_params

        bmesh = jax.sharding.Mesh(
            np.asarray(jax.devices()), axis_names=("batch",)
        )
        # one target per chip: the batch axis must fill the mesh
        obs_n = stack_obs(
            [jax.tree.map(lambda x: x[i % T], obs_ref) for i in range(n)]
        )
        params = stack_params([init_params(image=img) for _ in range(n)])
        p_ref, J_ref, _, _ = fit_many(params, obs_n, cfg)
        p_sh, J_sh, _, _ = fit_many(params, obs_n, cfg, mesh=bmesh)
        np.testing.assert_allclose(
            np.asarray(J_ref), np.asarray(J_sh), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(p_ref.B), np.asarray(p_sh.B), atol=1e-6
        )
        return {"mesh": f"batch x{n}"}

    check("fit_batch_mesh_equals_unsharded", check_fit_many_batch)

    def check_match_hlo():
        va = lambda x: NamedSharding(mesh_vr, P("view", *[None] * (x.ndim - 1)))
        ra = lambda x: NamedSharding(
            mesh_vr, P(None, "row", *[None] * (x.ndim - 2))
        )
        repl = NamedSharding(mesh_vr, P())
        v_args = [jax.device_put(j(x), va(x))
                  for x in (depths, rgbs, intrs, Rs, ts)]
        td = jax.device_put(j(depths[:T]), ra(depths[:T]))
        t_args = [jax.device_put(j(x), repl)
                  for x in (intrs[:T], Rs[:T], ts[:T])]
        f = jax.jit(functools.partial(
            match_survey, compact=True, bilinear=False,
            area=jnp.float32(H * W),
        ))
        hlo = f.lower(td, *t_args, *v_args, jnp.float32(1e-6)).compile().as_text()
        inv = collective_inventory(hlo)
        for op, nel, _ in inv:
            assert op == "all-reduce", f"unexpected {op} in matching HLO"
            assert nel <= T * V, f"all-reduce of {nel} elements — data moves"
        return {"collectives": [f"{op}[{nel}]x{g}" for op, nel, g in inv]}

    check("matching_communication_free_hlo", check_match_hlo)

    def check_fit_hlo():
        from sucre_tpu.parallel import stack_params
        from sucre_tpu.parallel.mesh import (
            _run_sharded_kernel,
            prepare_sharded_kernel_inputs,
        )

        sp = stack_params([init_params(image=img) for _ in range(T)])
        p, X, It, occ, n_obs = prepare_sharded_kernel_inputs(
            sp, obs_ref, mesh_row, False
        )
        hlo = (
            _run_sharded_kernel.lower(
                p, X, It, occ, n_obs, mesh=mesh_row, light=False, lr=0.05,
                num_iter=200,
                interpret=jax.devices()[0].platform != "tpu",
            )
            .compile()
            .as_text()
        )
        inv = collective_inventory(hlo)
        big_moving = []
        for op, nel, gsz in inv:
            assert op == "all-reduce", f"unexpected {op} in fit HLO"
            if gsz > 1 and nel > 64 * T:
                big_moving.append((op, nel, gsz))
        # 1xN row mesh: the dJ psum must compile to singleton groups
        assert not big_moving, (
            f"row mesh moved data per iteration: {big_moving}"
        )
        return {"collectives": [f"{op}[{nel}]x{g}" for op, nel, g in inv]}

    check("fit_row_mesh_zero_bytes_hlo", check_fit_hlo)

    if not args.skip_bench:
        def check_bench():
            import dataclasses as dc

            from bench import Workload
            from sucre_tpu.pipeline import dispatch_survey_batch

            # one batch of n targets, one per chip (batch sharding is the
            # communication-free aggregation mode — BASELINE.md §north-star)
            wl = Workload("podbench", 8, 256, 192, n, n, 50)
            bmesh = jax.sharding.Mesh(
                np.asarray(jax.devices()), axis_names=("batch",)
            )
            cfg = dc.replace(
                wl.cfg, rgb_plot_on_device=False,
                reconstruction_on_device=False,
            )
            walls = []
            for rep in range(3):
                wl.perturb(rep)
                t0 = time.perf_counter()
                bf = dispatch_survey_batch(
                    wl.scene, list(wl.targets), wl.tmp / "pod", cfg,
                    wl.scene.view_list(), wl.cache, wl.device_views,
                    mesh=bmesh,
                )
                float(np.asarray(jax.device_get(bf.J_dev[0, 0, 0, 0])))
                walls.append(time.perf_counter() - t0)
            best = min(walls[1:]) if len(walls) > 1 else walls[0]
            return {
                "mpix_s_aggregate": round(wl.mpix / best, 3),
                "note": "device-only batch-sharded workload "
                        f"({n} targets, one per device)",
            }

        check("aggregate_throughput", check_bench)

    results["ok"] = not failures
    results["failed"] = failures
    print(json.dumps(results))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
