"""Stage-level timing decomposition of the AdvancedMixConsole on TPU.

Times each console stage in isolation at the headline bench shape
(8 tracks x 262,144 samples, /root/reference/tests/test_profile.py:35-44)
so optimization effort goes where the milliseconds are:

  * track EQ (frequency-sampling rfft/irfft) fwd and fwd+bwd
  * track compressor (shipped smoother) fwd and fwd+bwd
  * pan + stereo sum
  * master chain (EQ + compressor + faders)
  * full console fwd, fwd+bwd (the headline), per eq_method

Writes logs/profile_console.json. Run from /root/repo on the TPU session:
    python scripts/profile_console.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from diffmst_tpu import ops
from diffmst_tpu.console import AdvancedMixConsole
from diffmst_tpu.console.ranges import advanced_param_ranges
from diffmst_tpu.utils.profiler import device_timer

SR = 44100.0
B, T = 8, 262144  # bs*num_tracks flattened, reference profiler shape


def _rand_params(key, group, n):
    R = advanced_param_ranges(SR)[group]
    return {
        k: jax.random.uniform(jax.random.fold_in(key, i), (n,), jnp.float32, lo, hi)
        for i, (k, (lo, hi)) in enumerate(R.items())
    }


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    results = {
        "backend": jax.default_backend(),
        "shape": f"{B}x{T}",
        "captured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, 1, T), jnp.float32) * 0.1

    def timed(name, fn, args, iters=10, grad_of=None):
        t_fwd = device_timer(fn, args, iters=iters)
        results[name] = {"fwd_ms": round(t_fwd * 1e3, 3)}
        if grad_of is not None:
            # grad_of: callable(args) -> scalar; time its full fwd+bwd.
            # jax.grad w.r.t. the whole args tuple returns a same-structured
            # pytree, which is exactly what device_timer's carry needs.
            gfn = jax.grad(grad_of)
            t_bwd = device_timer(gfn, args, iters=iters)
            results[name]["fwd_bwd_ms"] = round(t_bwd * 1e3, 3)
        print(name, results[name], flush=True)

    # --- stage: EQ (frequency sampling) ---
    eqp = _rand_params(key, "parametric_eq", B)

    def eq_fwd(args):
        (xx,) = args
        return (ops.parametric_eq(xx, SR, **eqp),)

    def eq_loss(args):
        (xx,) = args
        return jnp.sum(jnp.square(ops.parametric_eq(xx, SR, **eqp)))

    timed("track_eq_fs", eq_fwd, (x,), grad_of=eq_loss)

    # --- stage: EQ (causal fused kernel) ---
    if jax.default_backend() == "tpu":
        def eqs_fwd(args):
            (xx,) = args
            return (ops.parametric_eq(xx, SR, method="scan_pallas", **eqp),)

        def eqs_loss(args):
            (xx,) = args
            return jnp.sum(
                jnp.square(ops.parametric_eq(xx, SR, method="scan_pallas", **eqp))
            )

        try:
            timed("track_eq_scan_pallas", eqs_fwd, (x,), grad_of=eqs_loss)
        except Exception as exc:
            results["track_eq_scan_pallas"] = {"error": f"{type(exc).__name__}: {exc}"}

    # --- stage: compressor (auto smoother) ---
    cp = _rand_params(key, "compressor", B)

    def comp_fwd(args):
        (xx,) = args
        return (
            ops.compressor(xx, SR, **cp, lookahead_samples=2048, smoother="auto"),
        )

    def comp_loss(args):
        (xx,) = args
        return jnp.sum(
            jnp.square(
                ops.compressor(xx, SR, **cp, lookahead_samples=2048, smoother="auto")
            )
        )

    timed("track_comp_auto", comp_fwd, (x,), grad_of=comp_loss)

    # --- stage: pan + stereo sum (fwd+bwd only: the mix output is not
    # input-shaped, so the device_timer carry uses the gradient) ---
    pan = jax.random.uniform(jax.random.fold_in(key, 99), (1, B), jnp.float32)
    xt = x.reshape(1, B, T)

    def pan_loss(args):
        (xx,) = args
        return jnp.sum(jnp.square(ops.stereo_panner(xx, SR, pan).sum(axis=2)))

    t_pan = device_timer(jax.grad(pan_loss), (xt,), iters=10)
    results["pan_sum"] = {"fwd_bwd_ms": round(t_pan * 1e3, 3)}
    print("pan_sum", results["pan_sum"], flush=True)

    # --- stage: master chain (EQ + comp on stereo) ---
    mix = jax.random.normal(key, (1, 2, T), jnp.float32) * 0.1
    meqp = _rand_params(key, "parametric_eq", 1)
    mcp = _rand_params(key, "compressor", 1)

    def master_fwd(args):
        (mm,) = args
        y = ops.parametric_eq(mm, SR, **meqp)
        y = ops.compressor(
            y, SR, **mcp, lookahead_samples=1024, smoother="auto"
        )
        return (y,)

    def master_loss(args):
        (mm,) = args
        return jnp.sum(jnp.square(master_fwd(args)[0]))

    timed("master_eq_comp", master_fwd, (mix,), grad_of=master_loss)

    # --- full console fwd+bwd per eq_method (the headline decomposition) ---
    tracks = x.reshape(1, B, T)
    k1, k2, k3 = jax.random.split(key, 3)
    tp = jax.random.uniform(k1, (1, B, 27))
    fp = jax.random.uniform(k2, (1, 25))
    mp = jax.random.uniform(k3, (1, 26))
    methods = [("fs", {}), ]
    if jax.default_backend() == "tpu":
        methods += [("causal", {"comp_smoother": "fused_pallas",
                                "eq_method": "scan_pallas"})]
    for name, extra in methods:
        console = AdvancedMixConsole(SR, **extra)

        def cons_loss(args):
            tp_, mp_ = args
            out = console(tracks, tp_, fp, mp_, use_fx_bus=False)
            return jnp.sum(jnp.square(out.mix))

        def cons_fwdbwd(args):
            return jax.grad(cons_loss)(args)

        try:
            t = device_timer(cons_fwdbwd, (tp, mp), iters=8)
            results[f"console_fwd_bwd_{name}"] = {
                "ms": round(t * 1e3, 3),
                "x_realtime": round(T / SR / t, 1),
            }
            print(f"console_{name}", results[f"console_fwd_bwd_{name}"], flush=True)
        except Exception as exc:
            results[f"console_fwd_bwd_{name}"] = {
                "error": f"{type(exc).__name__}: {exc}"
            }

    os.makedirs("logs", exist_ok=True)
    with open("logs/profile_console.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
