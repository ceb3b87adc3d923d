"""Autoregressive LM sampling: recurrence parity with the batch forward,
sampling properties, prompt continuation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mqgan_tpu.models.lm_sampling import generate_tokens, greedy_next_logits
from mqgan_tpu.models.music_lstm import MusicLSTM

V, G = 30, 3


@pytest.fixture(scope="module")
def model_and_params():
    model = MusicLSTM(vocab_size=V, num_genres=G, emb_dim=8, lstm_hid=12,
                      lstm_layers=2, pad_id=0, dropout=0.0)
    tokens = jnp.asarray(np.random.default_rng(0).integers(1, V, (2, 6)))
    genres = jnp.asarray([0, 2])
    variables = model.init(jax.random.key(0), tokens, genres, None)
    return model, variables["params"]


def test_stepwise_matches_batch_forward(model_and_params, rng):
    """The sampler's cell recurrence reproduces the training forward's
    logits exactly (same params, same prefix)."""
    model, params = model_and_params
    tokens = jnp.asarray(rng.integers(1, V, (2, 7)))
    genres = jnp.asarray([1, 2])
    batch_logits = model.apply({"params": params}, tokens, genres, None)
    step_logits = greedy_next_logits(model, params, tokens, genres)
    np.testing.assert_allclose(np.asarray(step_logits),
                               np.asarray(batch_logits), atol=1e-5)


def test_generate_shapes_and_determinism(model_and_params):
    model, params = model_and_params
    genres = jnp.asarray([0, 1, 2])
    out = generate_tokens(model, params, genres, jax.random.key(7),
                          max_len=15, temperature=1.0)
    assert out.shape == (3, 15)
    assert int(out.min()) >= 0 and int(out.max()) < V
    out2 = generate_tokens(model, params, genres, jax.random.key(7),
                           max_len=15, temperature=1.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    out3 = generate_tokens(model, params, genres, jax.random.key(8),
                           max_len=15, temperature=1.0)
    assert not np.array_equal(np.asarray(out), np.asarray(out3))


def test_top_k_restricts_support(model_and_params):
    model, params = model_and_params
    genres = jnp.asarray([0])
    # top_k=1 == greedy: deterministic regardless of rng
    a = generate_tokens(model, params, genres, jax.random.key(1),
                        max_len=12, top_k=1)
    b = generate_tokens(model, params, genres, jax.random.key(2),
                        max_len=12, top_k=1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_top_p_nucleus(model_and_params):
    model, params = model_and_params
    genres = jnp.asarray([0, 1])
    # a vanishing nucleus keeps only the argmax -> greedy, rng-invariant,
    # and equal to top_k=1
    a = generate_tokens(model, params, genres, jax.random.key(1),
                        max_len=12, top_p=1e-9)
    b = generate_tokens(model, params, genres, jax.random.key(2),
                        max_len=12, top_p=1e-9)
    g = generate_tokens(model, params, genres, jax.random.key(3),
                        max_len=12, top_k=1)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(g))
    # top_p >= 1 disables the restriction: identical stream to unrestricted
    # sampling under the same key
    u = generate_tokens(model, params, genres, jax.random.key(4), max_len=12)
    p1 = generate_tokens(model, params, genres, jax.random.key(4),
                         max_len=12, top_p=1.0)
    np.testing.assert_array_equal(np.asarray(u), np.asarray(p1))


def test_prompt_continuation(model_and_params, rng):
    model, params = model_and_params
    genres = jnp.asarray([1])
    prompt = jnp.asarray(rng.integers(1, V, (1, 5)))
    out = generate_tokens(model, params, genres, jax.random.key(3),
                          max_len=10, prompt=prompt, top_k=1)
    assert out.shape == (1, 10)
    # the carried LSTM state depends on the prompt: the NEXT-token logits
    # after consuming two different prompts must differ. (Comparing greedy
    # TOKEN continuations instead is luck-of-init dependent — a random
    # model can collapse both onto the same argmax fixed point.)
    prompt2 = jnp.asarray(rng.integers(1, V, (1, 5)))
    l1 = np.asarray(greedy_next_logits(model, params, prompt, genres)[:, -1])
    l2 = np.asarray(greedy_next_logits(model, params, prompt2, genres)[:, -1])
    assert not np.allclose(l1, l2)
    # and the continuation is reproducible given prompt + key
    out2 = generate_tokens(model, params, genres, jax.random.key(3),
                           max_len=10, prompt=prompt, top_k=1)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
