"""Stage-level timing decomposition of the Method-1 train step on TPU.

The train step is the end-to-end metric (bench.py). This script times its
stages in isolation at the bs=1 recipe shape (1 x 8 x 262,144 — the config
that fits HBM in f32) so optimization goes where the milliseconds are:

  * track encoder (Cnn14 on 8 x (1025 x 257) spectrograms) fwd / fwd+bwd
  * mix encoder (2 ref channels)
  * controller (12-layer transformer, seq len 12)
  * console render (fwd+bwd measured in scripts/profile_console.py)
  * MRSTFT loss fwd+bwd
  * full train step (system.make_train_step)

Writes logs/profile_train.json. Run from /root/repo on the TPU session:
    python scripts/profile_train.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from diffmst_tpu.console import AdvancedMixConsole
from diffmst_tpu.losses import MultiResolutionSTFTLoss
from diffmst_tpu.models import MixStyleTransferModel
from diffmst_tpu.train import Batch, System, SystemConfig
from diffmst_tpu.utils.profiler import device_timer

SR = 44100.0
BS, NT, T = 1, 8, 262144
OUT_PATH = os.path.join("logs", "profile_train.json")


def _persist(results):
    os.makedirs("logs", exist_ok=True)
    with open(OUT_PATH, "w") as f:
        json.dump(results, f, indent=1)



def dispatch_timer(fn, args, iters=5, reps=3):
    """Plain pipelined-dispatch timing: ``iters`` dependent-free dispatches,
    one block at the end. Used for the encoder stages — the fori-loop carry
    trick in utils.profiler.device_timer mis-measures them (XLA elides the
    scalar-coupled encoder; measured 0.31 ms vs 16.7 ms real)."""
    out = jax.block_until_ready(fn(args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    print("backend:", jax.default_backend(), jax.devices(), flush=True)
    results = {
        "backend": jax.default_backend(),
        "shape": f"{BS}x{NT}x{T}",
        "captured_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    key = jax.random.PRNGKey(0)
    model = MixStyleTransferModel.build()
    system = System(
        model,
        AdvancedMixConsole(SR),
        MultiResolutionSTFTLoss(),
        SystemConfig(steps_per_epoch=100, max_epochs=100),
    )
    batch = Batch(
        tracks=jax.random.normal(key, (BS, NT, T), jnp.float32) * 10 ** (-48 / 20),
        instrument_id=jnp.zeros((BS, NT), jnp.int32),
        stereo_info=jnp.zeros((BS, NT), jnp.int32),
        track_padding=jnp.zeros((BS, NT), bool),
        ref_mix=jax.random.normal(key, (BS, 2, T), jnp.float32) * 0.1,
    )
    state = system.init(jax.random.PRNGKey(1), batch)
    mvars = {"params": state.params}
    if state.batch_stats:
        mvars["batch_stats"] = state.batch_stats

    # The A/B halving: the model sees half-length inputs (system.py:255-263)
    half = T // 2
    tracks_b = batch.tracks[..., half:]
    ref_a = batch.ref_mix[..., :half]

    def timed(name, fwd_fn, loss_fn, args, iters=6, timer=None):
        t = timer or device_timer
        try:
            t_f = t(jax.jit(fwd_fn), args, iters=iters)
            results[name] = {"fwd_ms": round(t_f * 1e3, 3)}
            if loss_fn is not None:
                gfn = jax.jit(jax.grad(loss_fn))
                t_b = t(gfn, args, iters=iters)
                results[name]["fwd_bwd_ms"] = round(t_b * 1e3, 3)
        except Exception as exc:
            results[name] = {"error": f"{type(exc).__name__}: {exc}"}
        _persist(results)
        print(name, results[name], flush=True)

    # --- track encoder ---
    flat = tracks_b.reshape(BS * NT, 1, half)

    # NOTE: model variables are passed as traced ARGUMENTS, not captured in
    # the closure — captured params become inline MLIR constants and the
    # 320 MB Cnn14 weight blob exceeds the remote compiler's request limit
    # (HTTP 413).
    def enc_apply(v, x):
        return model.apply(
            v, x.reshape(BS, NT, half), train=False,
            method=MixStyleTransferModel.encode_tracks,
        )

    def enc_fwd(args):
        v, x = args
        e = enc_apply(v, x)
        return (v, x * (1.0 + 1e-12 * jnp.mean(e)))

    def enc_loss(args):
        v, x = args
        return jnp.sum(jnp.square(enc_apply(v, x)))

    timed("track_encoder_8x131072", enc_fwd, enc_loss, (mvars, flat),
          timer=dispatch_timer)

    # --- mix encoder ---
    def mixenc_apply(v, r):
        return model.apply(
            v, r, train=False, method=MixStyleTransferModel.encode_mix
        )

    def mixenc_fwd(args):
        v, r = args
        e = mixenc_apply(v, r)
        return (v, r * (1.0 + 1e-12 * jnp.mean(e)))

    def mixenc_loss(args):
        v, r = args
        return jnp.sum(jnp.square(mixenc_apply(v, r)))

    timed("mix_encoder_2x131072", mixenc_fwd, mixenc_loss, (mvars, ref_a),
          timer=dispatch_timer)

    # --- controller ---
    te = jax.random.normal(key, (BS, NT, 512), jnp.float32)
    me = jax.random.normal(key, (BS, 2, 512), jnp.float32)

    def ctrl_apply(te_, me_):
        return model.apply(
            mvars, te_, me_, None, train=False,
            method=MixStyleTransferModel.control,
        )

    def ctrl_fwd(args):
        te_, me_ = args
        tp, fp, mp = ctrl_apply(te_, me_)
        s = jnp.sum(tp) + jnp.sum(fp) + jnp.sum(mp)
        return (te_ * (1.0 + 1e-12 * s), me_)

    def ctrl_loss(args):
        te_, me_ = args
        tp, fp, mp = ctrl_apply(te_, me_)
        return jnp.sum(jnp.square(tp)) + jnp.sum(jnp.square(fp)) + jnp.sum(
            jnp.square(mp)
        )

    timed("controller_12layer", ctrl_fwd, ctrl_loss, (te, me))

    # --- MRSTFT loss ---
    loss_mod = MultiResolutionSTFTLoss()
    pred = jax.random.normal(key, (BS, 2, half), jnp.float32) * 0.1
    tgt = jax.random.normal(jax.random.fold_in(key, 7), (BS, 2, half)) * 0.1

    def mrstft_fwd(args):
        (p,) = args
        l = loss_mod(p, tgt)
        l = l if isinstance(l, jnp.ndarray) else sum(l.values())
        return (p * (1.0 + 1e-12 * l),)

    def mrstft_loss(args):
        (p,) = args
        l = loss_mod(p, tgt)
        return l if isinstance(l, jnp.ndarray) else sum(l.values())

    timed("mrstft_loss", mrstft_fwd, mrstft_loss, (pred,))

    # --- full train step ---
    step = system.make_train_step(system.effect_flags(0), donate=False)
    K = 4

    @jax.jit
    def bench_k(state):
        def body(i, s):
            new_s, _ = step(s, batch, jax.random.fold_in(jax.random.PRNGKey(2), i))
            return new_s

        return jax.lax.fori_loop(0, K, body, state)

    jax.block_until_ready(bench_k(state))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(bench_k(state))
        best = min(best, (time.perf_counter() - t0) / K)
    results["train_step_full"] = {
        "ms": round(best * 1e3, 3),
        "x_realtime": round(BS * T / SR / best, 1),
    }
    _persist(results)
    print("train_step_full", results["train_step_full"], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
