"""HDemucs weight-port tests (VERDICT round-2 #8).

No torchaudio / pretrained weights exist in this environment, so the tests
pin what IS verifiable:

  * layer semantics — conv / transposed conv / GroupNorm / GLU / LSTM match
    torch primitives bit-for-bit given the same (torch-layout) weights;
  * the converter consumes a synthetic state_dict with torchaudio's exact
    HDemucs key inventory, every key lands in the tree, and the forward
    produces (B, 4, 2, T) stems;
  * the separator plugs into the Remixer interface.
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from diffmst_tpu.models import hdemucs as hd
from diffmst_tpu.models import make_hdemucs_separator, synthetic_hdemucs_state_dict
from diffmst_tpu.utils.checkpoint import port_hdemucs_state_dict

RNG = np.random.default_rng(0)


def _t(*shape, scale=0.1):
    return (RNG.standard_normal(shape) * scale).astype(np.float32)


def test_conv1d_matches_torch():
    x, w, b = _t(2, 6, 37), _t(8, 6, 3), _t(8)
    for stride, pad, dil in [(1, 1, 1), (4, 2, 1), (1, 2, 2)]:
        ours = hd._conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                          stride=stride, padding=pad, dilation=dil)
        ref = torch.nn.functional.conv1d(
            torch.tensor(x), torch.tensor(w), torch.tensor(b),
            stride=stride, padding=pad, dilation=dil,
        )
        np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_conv2d_matches_torch():
    x, w, b = _t(2, 4, 32, 9), _t(8, 4, 8, 1), _t(8)
    ours = hd._conv2d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                      stride=(4, 1), padding=(2, 0))
    ref = torch.nn.functional.conv2d(
        torch.tensor(x), torch.tensor(w), torch.tensor(b),
        stride=(4, 1), padding=(2, 0),
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)


def test_conv_transpose_matches_torch():
    x, w, b = _t(2, 6, 11), _t(6, 4, 8), _t(4)
    ours = hd._conv_tr1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), 4)
    ref = torch.nn.functional.conv_transpose1d(
        torch.tensor(x), torch.tensor(w), torch.tensor(b), stride=4
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)

    x2, w2, b2 = _t(2, 6, 1, 11), _t(6, 4, 8, 1), _t(4)
    ours2 = hd._conv_tr2d(jnp.asarray(x2), jnp.asarray(w2), jnp.asarray(b2), (4, 1))
    ref2 = torch.nn.functional.conv_transpose2d(
        torch.tensor(x2), torch.tensor(w2), torch.tensor(b2), stride=(4, 1)
    )
    np.testing.assert_allclose(np.asarray(ours2), ref2.numpy(), atol=1e-5)


def test_group_norm_and_glu_match_torch():
    x, w, b = _t(2, 8, 33, scale=1.0), _t(8, scale=1.0), _t(8)
    ours = hd._group_norm(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), 4)
    ref = torch.nn.functional.group_norm(
        torch.tensor(x), 4, torch.tensor(w), torch.tensor(b), eps=1e-5
    )
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=1e-5)

    g = _t(2, 8, 5, scale=1.0)
    np.testing.assert_allclose(
        np.asarray(hd._glu(jnp.asarray(g), axis=1)),
        torch.nn.functional.glu(torch.tensor(g), dim=1).numpy(),
        atol=1e-6,
    )


def test_bilstm_matches_torch():
    """2-layer bidirectional LSTM: torch weight layout + gate order."""
    dim, t, b = 6, 12, 2
    lstm = torch.nn.LSTM(dim, dim, num_layers=2, bidirectional=True)
    p = {k: v.detach().numpy() for k, v in lstm.named_parameters()}
    x = _t(t, b, dim, scale=0.5)
    ref, _ = lstm(torch.tensor(x))
    ours = hd._bilstm(jnp.asarray(x), {k: jnp.asarray(v) for k, v in p.items()}, 2)
    np.testing.assert_allclose(np.asarray(ours), ref.detach().numpy(), atol=1e-5)


@pytest.fixture(scope="module")
def small_params():
    sd = synthetic_hdemucs_state_dict(channels=16, nfft=4096)
    return sd, port_hdemucs_state_dict(sd)


def test_port_consumes_every_key(small_params):
    """Flattening the ported tree reproduces the state_dict key set exactly
    (inventory-exactness: a real checkpoint's every tensor has a slot)."""
    sd, params = small_params

    flat = {}

    def walk(node, path):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(v, path + [k])
        elif isinstance(node, list):
            for i, v in enumerate(node):
                walk(v, path + [str(i)])
        else:
            flat[".".join(path)] = node

    walk(params, [])
    assert set(flat) == set(sd)
    for k in sd:
        assert flat[k].shape == sd[k].shape, k


def test_hdemucs_forward_shapes(small_params):
    _, params = small_params
    t = 44100  # 1 s
    mix = jnp.asarray(_t(1, 2, t, scale=0.2))
    stems = hd.hdemucs_apply(params, mix)
    assert stems.shape == (1, 4, 2, t)
    assert bool(jnp.all(jnp.isfinite(stems)))
    # weights matter: a different random checkpoint separates differently
    params2 = port_hdemucs_state_dict(
        synthetic_hdemucs_state_dict(channels=16, seed=1)
    )
    stems2 = hd.hdemucs_apply(params2, mix)
    assert float(jnp.max(jnp.abs(stems - stems2))) > 1e-6


def test_blstm_framing_path():
    """T > max_steps triggers demucs' 200-wide / 100-stride framed LSTM with
    50-sample trims; output shape and finiteness are preserved."""
    dim, t = 4, 450
    lstm = torch.nn.LSTM(dim, dim, num_layers=2, bidirectional=True)
    p = {
        "lstm": {k: jnp.asarray(v.detach().numpy())
                 for k, v in lstm.named_parameters()},
        "linear": {
            "weight": jnp.asarray(_t(dim, 2 * dim)),
            "bias": jnp.asarray(_t(dim)),
        },
    }
    x = jnp.asarray(_t(2, dim, t, scale=0.5))
    y = hd._blstm(x, p)
    assert y.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(y)))


def test_separator_plugs_into_remixer(small_params):
    """make_hdemucs_separator satisfies the Remixer's (bs,2,T)->(bs,4,2,T)
    separator contract (ref mst/modules.py:496-500)."""
    _, params = small_params
    sep = make_hdemucs_separator(params)
    from diffmst_tpu.train.param_system import Remixer

    remixer = Remixer(separator=sep)
    assert remixer.separator is sep
    stems = sep(jnp.asarray(_t(1, 2, 22050, scale=0.2)))
    assert stems.shape == (1, 4, 2, 22050)
