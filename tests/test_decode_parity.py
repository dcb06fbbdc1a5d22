"""Full-decode parity: jitted JAX decode vs the NumPy oracle.

Humans are compared as sets of (part -> pixel coord, score) maps so that
human ordering differences (oracle: subset creation order; JAX: root
node id order) don't matter.
"""

import numpy as np
import pytest

from tfpose_tpu.core.config import DecodeParams
from tfpose_tpu.ops.decode import decode_jit
from tfpose_tpu.oracle import numpy_decoder, numpy_post
from tfpose_tpu.utils import synthetic

PARAMS = DecodeParams()


def _oracle_humans(net, up_h, up_w):
    peaks, heat, paf = numpy_post.full_post(net, up_h, up_w)
    res = numpy_decoder.process_paf(peaks, heat, paf, PARAMS)
    humans = []
    for hi in range(res.parts.shape[0]):
        parts = {}
        for p in range(18):
            cid, x, y, s = res.parts[hi, p]
            if cid >= 0:
                parts[p] = (int(x), int(y), float(s))
        humans.append((parts, float(res.scores[hi])))
    return humans


def _jax_humans(net, up_h, up_w):
    out = decode_jit(net, up_h, up_w, PARAMS)
    coords = np.asarray(out.coords)
    scores = np.asarray(out.part_scores)
    pvalid = np.asarray(out.part_valid)
    hscores = np.asarray(out.human_scores)
    hvalid = np.asarray(out.human_valid)
    humans = []
    for hi in range(coords.shape[0]):
        if not hvalid[hi]:
            continue
        parts = {}
        for p in range(18):
            if pvalid[hi, p]:
                x = int(round(coords[hi, p, 0] * up_w))
                y = int(round(coords[hi, p, 1] * up_h))
                parts[p] = (x, y, float(scores[hi, p]))
        humans.append((parts, float(hscores[hi])))
    return humans


def _match(oracle_hs, jax_hs, tol_px=0, tol_score=1e-3):
    assert len(oracle_hs) == len(jax_hs), (
        f"human count: oracle={len(oracle_hs)} jax={len(jax_hs)}")
    remaining = list(jax_hs)
    for oparts, oscore in oracle_hs:
        best = None
        for ji, (jparts, jscore) in enumerate(remaining):
            if set(jparts) != set(oparts):
                continue
            if all(abs(jparts[p][0] - oparts[p][0]) <= tol_px
                   and abs(jparts[p][1] - oparts[p][1]) <= tol_px
                   for p in oparts):
                best = ji
                break
        assert best is not None, f"no JAX match for oracle human {oparts}"
        jparts, jscore = remaining.pop(best)
        assert abs(jscore - oscore) < tol_score
        for p in oparts:
            assert abs(jparts[p][2] - oparts[p][2]) < tol_score


@pytest.mark.parametrize("seed,n_people", [(0, 1), (1, 2), (2, 3), (3, 4)])
def test_decode_parity_clean(seed, n_people):
    rng = np.random.default_rng(seed)
    net, _ = synthetic.render_scene(rng, n_people, 46, 54)
    up_h, up_w = 46 * 4, 54 * 4
    _match(_oracle_humans(net, up_h, up_w), _jax_humans(net, up_h, up_w))


@pytest.mark.parametrize("seed", [10, 11])
def test_decode_parity_noisy(seed):
    rng = np.random.default_rng(seed)
    net, _ = synthetic.render_scene(rng, 2, 46, 54, noise=0.01)
    up_h, up_w = 46 * 4, 54 * 4
    _match(_oracle_humans(net, up_h, up_w), _jax_humans(net, up_h, up_w))


def test_decode_parity_dropped_parts():
    rng = np.random.default_rng(20)
    net, _ = synthetic.render_scene(rng, 3, 46, 54, drop_prob=0.2)
    up_h, up_w = 46 * 4, 54 * 4
    _match(_oracle_humans(net, up_h, up_w), _jax_humans(net, up_h, up_w))


def test_decode_empty():
    net = np.zeros((46, 54, 57), np.float32)
    net[:, :, 18] = 1.0  # background
    out = decode_jit(net, 184, 216, PARAMS)
    assert not np.asarray(out.human_valid).any()


def test_decode_batch_matches_single():
    from tfpose_tpu.ops.decode import decode_batch
    rng = np.random.default_rng(30)
    nets = np.stack([synthetic.render_scene(rng, k, 23, 27)[0]
                     for k in (1, 2)])
    import jax
    batched = jax.jit(
        lambda t: decode_batch(t, 92, 108, PARAMS))(nets)
    for i in range(2):
        single = decode_jit(nets[i], 92, 108, PARAMS)
        np.testing.assert_allclose(np.asarray(batched.coords[i]),
                                   np.asarray(single.coords), atol=1e-6)
        assert (np.asarray(batched.human_valid[i])
                == np.asarray(single.human_valid)).all()


@pytest.mark.parametrize("seed,n_people,noise",
                         [(0, 1, 0.0), (1, 3, 0.01), (2, 4, 0.02),
                          (4, 0, 0.05)])
def test_dense_assemble_matches_scatter(seed, n_people, noise):
    """assemble_dense (production, vmap-friendly) must equal the
    scatter-based reference implementation bit-for-bit."""
    import jax
    import jax.numpy as jnp

    from tfpose_tpu.ops import nms as nmsmod, paf as pafmod
    from tfpose_tpu.ops.assemble import assemble, assemble_dense
    from tfpose_tpu.oracle import numpy_post

    rng = np.random.default_rng(seed)
    net, _ = synthetic.render_scene(rng, n_people, 46, 54, noise=noise)
    peaks_map, _, pafm = numpy_post.full_post(net, 184, 216)
    pk = nmsmod.top_peaks(jnp.asarray(peaks_map, jnp.float32),
                          PARAMS.max_peaks, PARAMS.thresh_heat)
    cands = pafmod.score_candidates(pk, jnp.asarray(pafm, jnp.float32),
                                    PARAMS)
    conns = pafmod.greedy_connections(cands, PARAMS)
    a = jax.tree.map(np.asarray, assemble(pk, conns, PARAMS))
    b = jax.tree.map(np.asarray, assemble_dense(pk, conns, PARAMS))
    for f in a._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(a, f), np.float32),
            np.asarray(getattr(b, f), np.float32), atol=1e-5,
            err_msg=f)


def test_fast_preset_matches_default_on_normal_scenes():
    """DecodeParams.fast() (smaller padding caps) must produce the same
    humans whenever peak counts stay under its caps."""
    rng = np.random.default_rng(40)
    net, _ = synthetic.render_scene(rng, 3, 46, 54)
    a = _jax_humans(net, 184, 216)
    global PARAMS
    default = PARAMS
    try:
        PARAMS = DecodeParams.fast()
        b = _jax_humans(net, 184, 216)
    finally:
        PARAMS = default
    assert len(a) == len(b)
    for (pa, sa), (pb, sb) in zip(
            sorted(a, key=lambda h: sorted(h[0].items())),
            sorted(b, key=lambda h: sorted(h[0].items()))):
        assert pa == pb
        assert abs(sa - sb) < 1e-4
