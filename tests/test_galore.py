"""GaLore projector tests: orthogonality, round-trip, DiodeMix integration."""

import jax
import jax.numpy as jnp
import numpy as np

from bitorch_engine_tpu.optim.galore import (
    GaLoreConfig,
    galore_init,
    galore_project,
    galore_project_back,
)


def test_projection_shapes_and_orthogonality():
    cfg = GaLoreConfig(rank=8, update_proj_gap=10, scale=1.0)
    rng = np.random.default_rng(0)
    # tall gradient → RIGHT projection (reference 'std' rule)
    g = jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32))
    st = galore_init(g.shape, cfg.rank)
    assert st.right
    proj, st = galore_project(st, g, jnp.asarray(0), cfg)
    assert proj.shape == (64, 8)
    # ortho rows orthonormal
    o = np.asarray(st.ortho)
    np.testing.assert_allclose(o @ o.T, np.eye(8), atol=1e-5)
    full = galore_project_back(st, proj, cfg)
    assert full.shape == (64, 32)
    # wide gradient → LEFT projection
    g2 = jnp.asarray(rng.standard_normal((32, 64)).astype(np.float32))
    st2 = galore_init(g2.shape, cfg.rank)
    assert not st2.right
    proj2, st2 = galore_project(st2, g2, jnp.asarray(0), cfg)
    assert proj2.shape == (8, 64)


def test_orientation_matches_reference_std_rule():
    """Pin the 'std' orientation semantics against a direct transcription of
    the reference rule (galore_projector.py:28-37): shape[0] >= shape[1] →
    ortho from the right singular vectors, low_rank = g @ ortho.T; else
    ortho from the left singular vectors, low_rank = ortho.T @ g."""
    cfg = GaLoreConfig(rank=4, update_proj_gap=10, scale=1.0)
    rng = np.random.default_rng(7)
    for shape in ((48, 16), (16, 48), (32, 32)):
        g = rng.standard_normal(shape).astype(np.float32)
        u, s, vh = np.linalg.svd(g, full_matrices=False)
        if shape[0] >= shape[1]:
            ref_low = g @ vh[: cfg.rank].T
        else:
            ref_low = u[:, : cfg.rank].T @ g
        st = galore_init(g.shape, cfg.rank)
        proj, st = galore_project(st, jnp.asarray(g), jnp.asarray(0), cfg)
        assert proj.shape == ref_low.shape, (shape, proj.shape, ref_low.shape)
        # same subspace: compare |values| (SVD sign ambiguity)
        np.testing.assert_allclose(
            np.abs(np.asarray(proj)), np.abs(ref_low), rtol=1e-3, atol=1e-3
        )


def test_low_rank_roundtrip_preserves_top_component():
    """Projecting a rank-1 gradient loses nothing."""
    cfg = GaLoreConfig(rank=4, update_proj_gap=10, scale=1.0)
    rng = np.random.default_rng(1)
    u = rng.standard_normal((16, 1)).astype(np.float32)
    v = rng.standard_normal((1, 48)).astype(np.float32)
    g = jnp.asarray(u @ v)
    st = galore_init(g.shape, cfg.rank)
    proj, st = galore_project(st, g, jnp.asarray(0), cfg)
    back = galore_project_back(st, proj, cfg)
    np.testing.assert_allclose(np.asarray(back), np.asarray(g), rtol=1e-4, atol=1e-5)


def test_refresh_schedule():
    cfg = GaLoreConfig(rank=4, update_proj_gap=5, scale=1.0)
    rng = np.random.default_rng(2)
    g1 = jnp.asarray(rng.standard_normal((16, 32)).astype(np.float32))
    g2 = jnp.asarray(rng.standard_normal((16, 32)).astype(np.float32))
    st = galore_init(g1.shape, cfg.rank)
    _, st1 = galore_project(st, g1, jnp.asarray(0), cfg)
    # step 2: no refresh → ortho unchanged even with different grads
    _, st2 = galore_project(st1, g2, jnp.asarray(2), cfg)
    np.testing.assert_array_equal(np.asarray(st1.ortho), np.asarray(st2.ortho))
    # step 5: refresh
    _, st3 = galore_project(st2, g2, jnp.asarray(5), cfg)
    assert not np.array_equal(np.asarray(st2.ortho), np.asarray(st3.ortho))


def test_diode_with_galore_trains():
    """MPQ + GaLore end to end under jit: loss decreases."""
    from bitorch_engine_tpu.ops import quant
    from bitorch_engine_tpu.ops.mpq_linear import mpq_linear
    from bitorch_engine_tpu.optim import DiodeHyperParams, diode_init, diode_update
    from bitorch_engine_tpu.qtensor import with_grad_shadow

    rng = np.random.default_rng(3)
    k, n = 64, 64
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.1
    qt = with_grad_shadow(quant.quantize_mpq(jnp.asarray(w), w_bit=8, group_size=32))
    x = jnp.asarray(rng.standard_normal((32, k)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((32, n)).astype(np.float32))
    hp = DiodeHyperParams(
        lr=2e-3, galore=GaLoreConfig(rank=16, update_proj_gap=5, scale=0.25)
    )
    params = {"q": qt}
    state = diode_init(params, hp=hp)

    @jax.jit
    def step(params, state):
        def loss_fn(p):
            return jnp.mean((mpq_linear(x, p["q"]) - y) ** 2)

        loss, grads = jax.value_and_grad(loss_fn, allow_int=True)(params)
        p2, s2 = diode_update(grads, state, params, hp)
        return p2, s2, loss

    losses = []
    for _ in range(25):
        params, state, loss = step(params, state)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses[:3] + losses[-3:]


def test_galore_applies_to_fp_matrices():
    """fp 2-D leaves get GaLore moments in projected space (reference
    projects fp param groups carrying 'rank', diode_beta.py:133-139);
    1-D leaves and small matrices stay full-rank."""
    from bitorch_engine_tpu.optim import DiodeHyperParams, diode_init, diode_update

    rng = np.random.default_rng(9)
    params = {
        "w": jnp.asarray(rng.standard_normal((64, 32)).astype(np.float32)),
        "bias": jnp.zeros((32,)),
        "tiny": jnp.asarray(rng.standard_normal((4, 4)).astype(np.float32)),
    }
    hp = DiodeHyperParams(lr=1e-3, galore=GaLoreConfig(rank=8, update_proj_gap=5))
    state = diode_init(params, hp=hp)
    ls = state.leaf_states
    assert "galore" in ls["w"] and ls["w"]["exp_avg_l"].shape == (64, 8)
    assert "galore" not in ls["bias"]
    assert "galore" not in ls["tiny"]

    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    p2, s2 = jax.jit(lambda g, s, p: diode_update(g, s, p, hp))(grads, state, params)
    assert p2["w"].shape == (64, 32)
    assert not np.allclose(np.asarray(p2["w"]), np.asarray(params["w"]))
    for l in jax.tree_util.tree_leaves(p2):
        assert np.isfinite(np.asarray(l)).all()
