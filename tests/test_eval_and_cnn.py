"""Perplexity gate + quantized CNN tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bitorch_engine_tpu.models.cnn import QuantConvNet
from bitorch_engine_tpu.models.eval import perplexity, perplexity_delta
from bitorch_engine_tpu.models.llama import LlamaModel, tiny_llama


def _quantize_llama_params(params_fp, w_bit, gs):
    from bitorch_engine_tpu.ops import quant as q

    def convert(tree):
        if isinstance(tree, dict):
            out = {}
            for key, val in tree.items():
                if isinstance(val, dict) and set(val) == {"kernel"}:
                    out[key] = {
                        "qweight": q.quantize_mpq(val["kernel"], w_bit=w_bit, group_size=gs)
                    }
                else:
                    out[key] = convert(val)
            return out
        return tree

    return convert(jax.tree_util.tree_map(lambda x: x, params_fp))


def test_perplexity_gate_4bit_vs_fp():
    """On a tiny random model, 4-bit quantization must keep relative PPL Δ
    small — the 'no significant loss' gate shape (BASELINE.md)."""
    cfg_fp = tiny_llama(quantized=False, dtype=jnp.float32)
    model_fp = LlamaModel(cfg_fp)
    tokens = jax.random.randint(jax.random.PRNGKey(0), (2, 64), 0, cfg_fp.vocab_size)
    params_fp = model_fp.init(jax.random.PRNGKey(1), tokens)

    cfg_q = tiny_llama(quantized=True, dtype=jnp.float32, w_bit=4, group_size=64)
    model_q = LlamaModel(cfg_q)
    params_q = _quantize_llama_params(params_fp, 4, 64)

    res = perplexity_delta(model_fp, params_fp, model_q, params_q, tokens)
    assert res["ppl_fp"] > 0
    assert abs(res["rel_delta"]) < 0.05, res
    # 2-bit path also evaluates cleanly (ordering vs 4-bit only holds for
    # trained weights, not random ones — the real gate runs on checkpoints)
    cfg_q2 = tiny_llama(quantized=True, dtype=jnp.float32, w_bit=2, group_size=64)
    model_q2 = LlamaModel(cfg_q2)
    params_q2 = _quantize_llama_params(params_fp, 2, 64)
    res2 = perplexity_delta(model_fp, params_fp, model_q2, params_q2, tokens)
    assert np.isfinite(res2["ppl_quant"]) and res2["ppl_quant"] > 0


@pytest.mark.parametrize("bits", [1, 4])
def test_quant_convnet_forward_and_grads(bits):
    model = QuantConvNet(bits=bits, widths=(16, 32, 32))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 3))
    variables = model.init(jax.random.PRNGKey(1), x)
    out = model.apply(variables, x)
    assert out.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()

    from bitorch_engine_tpu.utils import prepare_for_training

    tvars = prepare_for_training(variables)

    def loss(v):
        return jnp.sum(model.apply(v, x) ** 2)

    grads = jax.grad(loss, allow_int=True)(tvars)
    qgrads = grads["params"]["qconv_0"]["qweight"]
    assert float(jnp.sum(jnp.abs(qgrads.grad_shadow))) > 0
