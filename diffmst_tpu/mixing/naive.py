"""Random reference-mix generator (Method-1 training data factory).

Rebuild of ``naive_random_mix`` (/root/reference/mst/mixing.py:35-94):
uniform-random (0,1) parameters for all three groups, rendered through the
console with gradients stopped. Device-side ``jax.random`` replaces torch's
host RNG; the same 8-tuple return is preserved (denormalized dicts + raw
normalized tensors — the raw tensors feed the param-loss option).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["NaiveRandomMix", "naive_random_mix"]


class NaiveRandomMix(NamedTuple):
    mixed_tracks: jnp.ndarray
    mix: jnp.ndarray
    track_param_dict: dict
    fx_bus_param_dict: dict
    master_bus_param_dict: dict
    track_params: jnp.ndarray
    fx_bus_params: jnp.ndarray
    master_bus_params: jnp.ndarray


def naive_random_mix(
    tracks: jnp.ndarray,
    mix_console,
    key: jax.Array,
    use_track_input_fader: bool = True,
    use_track_eq: bool = True,
    use_track_compressor: bool = True,
    use_track_panner: bool = True,
    use_fx_bus: bool = True,
    use_master_bus: bool = True,
    use_output_fader: bool = True,
    **_unused_kwargs,
) -> NaiveRandomMix:
    """Render a reference mix with uniformly random console parameters.

    Args:
      tracks: (bs, num_tracks, seq_len) mono stems.
      mix_console: a console instance (Basic or Advanced).
      key: PRNG key (consumed for params and, when active, the reverb noise).

    Returns:
      NaiveRandomMix 8-tuple; all outputs carry stop_gradient (the reference
      renders under torch.no_grad, mixing.py:72).
    """
    bs, num_tracks, _ = tracks.shape
    k_track, k_fx, k_master, k_reverb = jax.random.split(key, 4)

    track_params = jax.random.uniform(
        k_track, (bs, num_tracks, mix_console.num_track_control_params)
    )
    fx_bus_params = jax.random.uniform(
        k_fx, (bs, mix_console.num_fx_bus_control_params)
    )
    master_bus_params = jax.random.uniform(
        k_master, (bs, mix_console.num_master_bus_control_params)
    )

    out = mix_console(
        tracks,
        track_params,
        fx_bus_params,
        master_bus_params,
        use_track_input_fader=use_track_input_fader,
        use_track_eq=use_track_eq,
        use_track_compressor=use_track_compressor,
        use_track_panner=use_track_panner,
        use_fx_bus=use_fx_bus,
        use_master_bus=use_master_bus,
        use_output_fader=use_output_fader,
        key=k_reverb,
    )
    sg = jax.lax.stop_gradient
    return NaiveRandomMix(
        sg(out.mixed_tracks),
        sg(out.mix),
        jax.tree.map(sg, out.track_param_dict),
        jax.tree.map(sg, out.fx_bus_param_dict),
        jax.tree.map(sg, out.master_bus_param_dict),
        sg(track_params),
        sg(fx_bus_params),
        sg(master_bus_params),
    )
