"""Differentiable mix consoles (Basic: gain+pan; Advanced: full channel strip).

Pure-functional JAX rebuilds of the reference consoles:
  * signal chain    /root/reference/mst/modules.py:186-314 (forward_mix_console)
  * param plumbing  modules.py:316-487 (forward)

A console instance holds only static configuration (sample rate, ranges,
effect-chain constants); its ``__call__`` is a pure function
``(tracks, track_params, fx_bus_params, master_bus_params, key) -> ConsoleOutput``
that jits cleanly with the ``use_*`` effect toggles as static arguments
(curriculum stages each compile once — there are <= 5 stages).

Per-track processing is expressed over the flattened (batch*track) axis: on
TPU this is the natural secondary sharding axis, and the EQ/compressor FFT
work batches into single large rFFTs across all tracks at once.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from diffmst_tpu import ops
from diffmst_tpu.console import ranges as _ranges

__all__ = ["ConsoleOutput", "BasicMixConsole", "AdvancedMixConsole"]

ParamDict = Dict[str, Dict[str, jnp.ndarray]]


class ConsoleOutput(NamedTuple):
    """Mirror of the reference console's 5-tuple return (modules.py:481-487)."""

    mixed_tracks: jnp.ndarray  # (bs, 2, num_tracks, seq_len) panned per-track stems
    mix: jnp.ndarray  # (bs, 2, seq_len) master bus output
    track_param_dict: ParamDict
    fx_bus_param_dict: ParamDict
    master_bus_param_dict: ParamDict


@dataclasses.dataclass(frozen=True)
class BasicMixConsole:
    """Gain + constant-power pan console (the reference's deleted entry config).

    Track parameter layout: [gain_db, pan] (2 params, normalized (0,1)).
    FX/master parameter counts are 0 — the basic console has no busses.
    """

    sample_rate: float = 44100.0
    input_min_gain_db: float = -48.0
    input_max_gain_db: float = 48.0
    min_pan: float = 0.0
    max_pan: float = 1.0

    num_track_control_params: int = 2
    num_fx_bus_control_params: int = 0
    num_master_bus_control_params: int = 0

    @property
    def param_ranges(self):
        return _ranges.basic_param_ranges(
            self.input_min_gain_db,
            self.input_max_gain_db,
            self.min_pan,
            self.max_pan,
        )

    def param_dicts(self, track_params, fx_bus_params=None, master_bus_params=None):
        """Denormalized (track, fx, master) dicts; basic console has no busses."""
        param_dict = {
            "input_fader": {"gain_db": track_params[..., 0]},
            "stereo_panner": {"pan": track_params[..., 1]},
        }
        return _ranges.denormalize_parameters(param_dict, self.param_ranges), {}, {}

    def __call__(
        self,
        tracks: jnp.ndarray,
        track_params: jnp.ndarray,
        fx_bus_params: Optional[jnp.ndarray] = None,
        master_bus_params: Optional[jnp.ndarray] = None,
        *,
        use_track_input_fader: bool = True,
        use_track_panner: bool = True,
        key: Optional[jax.Array] = None,
        **_unused_flags,
    ) -> ConsoleOutput:
        bs, num_tracks, seq_len = tracks.shape
        d, _, _ = self.param_dicts(track_params)

        x = tracks
        if use_track_input_fader:
            x = x * ops.db_to_linear(d["input_fader"]["gain_db"])[..., None]
        if use_track_panner:
            stems = ops.stereo_panner(x, self.sample_rate, d["stereo_panner"]["pan"])
        else:
            stems = ops.mono_to_stereo(x)
        mix = stems.sum(axis=2)
        return ConsoleOutput(stems, mix, d, {}, {})


@dataclasses.dataclass(frozen=True)
class AdvancedMixConsole:
    """Full differentiable console.

    Chain (modules.py:186-314): per-track [input fader -> 6-band parametric EQ
    -> compressor(lookahead 2048)] -> constant-power pan -> stereo sum;
    FX bus [per-track send -> 12-band noise reverb] added to the master;
    master bus [input fader -> EQ -> compressor(lookahead 1024)] ->
    output fader.
    """

    sample_rate: float = 44100.0
    input_min_gain_db: float = -48.0
    input_max_gain_db: float = 48.0
    output_min_gain_db: float = -48.0
    output_max_gain_db: float = 48.0
    min_send_db: float = -80.0
    max_send_db: float = 12.0
    eq_min_gain_db: float = -12.0
    eq_max_gain_db: float = 12.0
    min_pan: float = 0.0
    max_pan: float = 1.0
    reverb_min_band_gain: float = 0.0
    reverb_max_band_gain: float = 1.0
    reverb_min_band_decay: float = 0.0
    reverb_max_band_decay: float = 1.0

    # Chain constants (modules.py:250,277-283,304)
    track_comp_lookahead: int = 2048
    master_comp_lookahead: int = 1024
    reverb_num_samples: int = 65536
    reverb_num_taps: int = 1023
    # Ballistics smoother for both compressors (ops/compressor.py):
    #   "auto" (default) — the exact causal attack one-pole as an XLA
    #     associative scan (measured fastest exact fwd+bwd on TPU v5e —
    #     scripts/microbench_tpu.py; the Pallas kernel stays available as
    #     "scan_pallas", identical numerics).
    #   "fsm" — bit-level reference behavior: the same one-pole applied as a
    #     circular FFT convolution, which wraps the gain envelope across
    #     segment ends (measured: up to ~57% of peak deviation from the
    #     causal smoother in the first ~4096 samples, <7% after wrap-in).
    #     Use for exact parity with reference-trained checkpoints.
    #   "decoupled" — attack/release with a working release (parallel);
    #   "ballistics" — exact branching ballistics (sequential; offline).
    comp_smoother: str = "auto"
    # EQ application method (ops/eq.py): "fs" (default) — the reference's
    # frequency-sampling circular convolution; "scan" / "scan_pallas" —
    # exact causal IIR via associative scans / the fused streaming kernel
    # (kernels/iir_fused.py). Causal modes are opt-in deviations; see
    # ops/iir.py for the f32 pole-radius envelope.
    eq_method: str = "fs"
    # Optional device mesh: when set (and it has an "mp" axis), the per-track
    # chain runs under shard_map with tracks sharded over mp — explicit
    # locality for the embarrassingly-parallel section (see _track_chain).
    mesh: Optional[object] = None

    num_track_control_params: int = _ranges.NUM_TRACK_PARAMS
    num_fx_bus_control_params: int = _ranges.NUM_FX_BUS_PARAMS
    num_master_bus_control_params: int = _ranges.NUM_MASTER_BUS_PARAMS

    @property
    def param_ranges(self):
        return _ranges.advanced_param_ranges(
            self.sample_rate,
            self.input_min_gain_db,
            self.input_max_gain_db,
            self.output_min_gain_db,
            self.output_max_gain_db,
            self.min_send_db,
            self.max_send_db,
            self.eq_min_gain_db,
            self.eq_max_gain_db,
            self.min_pan,
            self.max_pan,
            self.reverb_min_band_gain,
            self.reverb_max_band_gain,
            self.reverb_min_band_decay,
            self.reverb_max_band_decay,
        )

    def param_dicts(self, track_params, fx_bus_params=None, master_bus_params=None):
        """Denormalized (track, fx, master) parameter dicts from (0,1)
        vectors; omitted bus groups come back as empty dicts."""
        rngs = self.param_ranges
        track_d = _ranges.denormalize_parameters(
            _ranges.split_track_params(track_params), rngs
        )
        fx_d = (
            _ranges.denormalize_parameters(
                _ranges.split_fx_bus_params(fx_bus_params), rngs
            )
            if fx_bus_params is not None
            else {}
        )
        master_d = (
            _ranges.denormalize_parameters(
                _ranges.split_master_bus_params(master_bus_params), rngs
            )
            if master_bus_params is not None
            else {}
        )
        return track_d, fx_d, master_d

    def _track_chain(
        self,
        tracks: jnp.ndarray,
        track_param_dict: ParamDict,
        use_track_input_fader: bool,
        use_track_eq: bool,
        use_track_compressor: bool,
    ) -> jnp.ndarray:
        """Per-track gain -> EQ -> compressor over (bs, num_tracks, seq_len).

        Embarrassingly parallel over tracks; under an ``mp`` mesh this body
        runs inside shard_map on the local track shard, so its FFTs are
        shard-local (no cross-device layouts — the TPU-optimal formulation,
        and the XLA:CPU fft_thunk layout limitation never triggers).
        """
        bs, num_tracks, seq_len = tracks.shape
        sr = self.sample_rate
        x = tracks.reshape(bs * num_tracks, 1, seq_len)

        def flat(p):  # (bs, num_tracks) -> (bs*num_tracks,)
            return p.reshape(bs * num_tracks)

        fader_lin = None
        if use_track_input_fader:
            fader_lin = ops.db_to_linear(
                flat(track_param_dict["input_fader"]["gain_db"])
            )
            if not use_track_eq:
                x = x * fader_lin[:, None, None]
        if use_track_eq:
            eq = {k: flat(v) for k, v in track_param_dict["parametric_eq"].items()}
            # fader folds into the EQ's frequency response: one fewer full
            # (B, T) HBM round trip (elementwise can't fuse into the FFT call)
            x = ops.parametric_eq(
                x, sr, linear_gain=fader_lin, method=self.eq_method, **eq
            )
        if use_track_compressor:
            comp = {k: flat(v) for k, v in track_param_dict["compressor"].items()}
            x = ops.compressor(
                x, sr, **comp,
                lookahead_samples=self.track_comp_lookahead,
                smoother=self.comp_smoother,
            )
        return x.reshape(bs, num_tracks, seq_len)

    def forward_mix_console(
        self,
        tracks: jnp.ndarray,
        track_param_dict: ParamDict,
        fx_bus_param_dict: ParamDict,
        master_bus_param_dict: ParamDict,
        use_track_input_fader: bool = True,
        use_track_eq: bool = True,
        use_track_compressor: bool = True,
        use_track_panner: bool = True,
        use_fx_bus: bool = True,
        use_master_bus: bool = True,
        use_output_fader: bool = True,
        key: Optional[jax.Array] = None,
    ):
        """Render denormalized parameter dicts (mirrors modules.py:186-314)."""
        bs, num_tracks, seq_len = tracks.shape
        sr = self.sample_rate

        chain_kwargs = dict(
            use_track_input_fader=use_track_input_fader,
            use_track_eq=use_track_eq,
            use_track_compressor=use_track_compressor,
        )
        track_keys = ("input_fader", "parametric_eq", "compressor")
        chain_params = {k: track_param_dict[k] for k in track_keys}
        if self.mesh is not None and "mp" in self.mesh.shape:
            from jax.sharding import PartitionSpec as P
            from jax import shard_map

            from diffmst_tpu.parallel.mesh import assert_mesh_divisible

            assert_mesh_divisible(
                self.mesh, tracks.shape[0], tracks.shape[1], "console track chain"
            )
            spec_x = P("dp", "mp", None)
            spec_p = jax.tree.map(lambda _: P("dp", "mp"), chain_params)
            x = shard_map(
                lambda t, p: self._track_chain(t, p, **chain_kwargs),
                mesh=self.mesh,
                in_specs=(spec_x, spec_p),
                out_specs=spec_x,
                check_vma=False,
            )(tracks, chain_params)
        else:
            x = self._track_chain(tracks, chain_params, **chain_kwargs)

        if use_track_panner:
            stems = ops.stereo_panner(x, sr, track_param_dict["stereo_panner"]["pan"])
        else:
            stems = ops.mono_to_stereo(x)

        master = stems.sum(axis=2)  # (bs, 2, seq_len)

        if use_fx_bus:
            fx = ops.stereo_bus(stems, sr, track_param_dict["fx_bus"]["send_db"])
            fx = ops.noise_shaped_reverberation(
                fx, sr,
                **fx_bus_param_dict["reverberation"],
                num_samples=self.reverb_num_samples,
                num_bandpass_taps=self.reverb_num_taps,
                key=key,
            )
            master = master + fx

        if use_master_bus:
            # Input fader folds into the EQ's sampled frequency response and
            # the output fader into the compressor's makeup gain
            # (10^((g+m)/20) * 10^(o/20) == 10^((g+m+o)/20)) — two fewer
            # full-signal HBM passes on the latency-bound master chain.
            master = ops.parametric_eq(
                master, sr,
                linear_gain=ops.db_to_linear(
                    master_bus_param_dict["input_fader"]["gain_db"]
                ),
                method=self.eq_method,
                **master_bus_param_dict["parametric_eq"],
            )
            comp_kwargs = dict(master_bus_param_dict["compressor"])
            if use_output_fader:
                comp_kwargs["makeup_gain_db"] = (
                    comp_kwargs["makeup_gain_db"]
                    + master_bus_param_dict["output_fader"]["gain_db"]
                )
            master = ops.compressor(
                master, sr, **comp_kwargs,
                lookahead_samples=self.master_comp_lookahead,
                smoother=self.comp_smoother,
            )
        elif use_output_fader:
            master = ops.gain(
                master, sr, master_bus_param_dict["output_fader"]["gain_db"]
            )

        return stems, master

    def __call__(
        self,
        tracks: jnp.ndarray,
        track_params: jnp.ndarray,
        fx_bus_params: jnp.ndarray,
        master_bus_params: jnp.ndarray,
        *,
        use_track_input_fader: bool = True,
        use_track_eq: bool = True,
        use_track_compressor: bool = True,
        use_track_panner: bool = True,
        use_fx_bus: bool = True,
        use_master_bus: bool = True,
        use_output_fader: bool = True,
        key: Optional[jax.Array] = None,
    ) -> ConsoleOutput:
        """Render a mix from normalized (0,1) parameter vectors.

        Args:
          tracks: (bs, num_tracks, seq_len) mono stems.
          track_params: (bs, num_tracks, 27) normalized parameters.
          fx_bus_params: (bs, 25) normalized parameters.
          master_bus_params: (bs, 26) normalized parameters.
          use_*: static effect toggles (curriculum stages).
          key: PRNG key for the reverb noise IR (required when use_fx_bus).
        """
        track_d, fx_d, master_d = self.param_dicts(
            track_params, fx_bus_params, master_bus_params
        )
        stems, mix = self.forward_mix_console(
            tracks,
            track_d,
            fx_d,
            master_d,
            use_track_input_fader=use_track_input_fader,
            use_track_eq=use_track_eq,
            use_track_compressor=use_track_compressor,
            use_track_panner=use_track_panner,
            use_fx_bus=use_fx_bus,
            use_master_bus=use_master_bus,
            use_output_fader=use_output_fader,
            key=key,
        )
        return ConsoleOutput(stems, mix, track_d, fx_d, master_d)
