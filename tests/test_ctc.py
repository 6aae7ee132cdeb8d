"""CTC loss golden-tested against torch.nn.functional.ctc_loss (and its
gradients); greedy decode against hand-computed expectations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from stt_tpu.ctc import collapse_best_path, ctc_loss, greedy_decode


def torch_ctc(logits, logit_lens, labels, label_lens):
    """Golden: torch CTC with blank remapped from 0 to C-1."""
    torch = pytest.importorskip("torch")
    b, t, c = logits.shape
    # torch wants blank=0; rotate classes so our blank (C-1) becomes 0
    rotated = np.concatenate([logits[..., -1:], logits[..., :-1]], axis=-1)
    x = torch.from_numpy(rotated.transpose(1, 0, 2)).requires_grad_(True)
    lp = torch.nn.functional.log_softmax(x, dim=-1)
    tgt = torch.from_numpy((labels + 1).astype(np.int64))
    loss = torch.nn.functional.ctc_loss(
        lp,
        tgt,
        torch.from_numpy(logit_lens.astype(np.int64)),
        torch.from_numpy(label_lens.astype(np.int64)),
        blank=0,
        reduction="none",
        zero_infinity=False,
    )
    loss.sum().backward()
    grad_rot = x.grad.numpy().transpose(1, 0, 2)
    grad = np.concatenate([grad_rot[..., 1:], grad_rot[..., :1]], axis=-1)
    return loss.detach().numpy(), grad


def random_case(rng, b=3, t=20, c=6, l=5):
    logits = rng.randn(b, t, c).astype(np.float32)
    logit_lens = rng.randint(l * 2 + 2, t + 1, size=b).astype(np.int32)
    labels = rng.randint(0, c - 1, size=(b, l)).astype(np.int32)
    label_lens = rng.randint(1, l + 1, size=b).astype(np.int32)
    return logits, logit_lens, labels, label_lens


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_loss_matches_torch(seed):
    rng = np.random.RandomState(seed)
    logits, logit_lens, labels, label_lens = random_case(rng)
    ref, _ = torch_ctc(logits, logit_lens, labels, label_lens)
    got = np.asarray(
        ctc_loss(jnp.asarray(logits), jnp.asarray(logit_lens),
                 jnp.asarray(labels), jnp.asarray(label_lens))
    )
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_grad_matches_torch():
    rng = np.random.RandomState(7)
    logits, logit_lens, labels, label_lens = random_case(rng)
    _, ref_grad = torch_ctc(logits, logit_lens, labels, label_lens)

    def total(lg):
        return jnp.sum(
            ctc_loss(lg, jnp.asarray(logit_lens), jnp.asarray(labels),
                     jnp.asarray(label_lens))
        )

    got_grad = np.asarray(jax.grad(total)(jnp.asarray(logits)))
    np.testing.assert_allclose(got_grad, ref_grad, rtol=1e-3, atol=1e-4)


def test_repeated_labels():
    """Repeats require an intervening blank — stresses the skip mask."""
    rng = np.random.RandomState(3)
    logits = rng.randn(1, 12, 4).astype(np.float32)
    labels = np.array([[1, 1, 2, 2]], np.int32)
    lens = np.array([12], np.int32)
    lab_lens = np.array([4], np.int32)
    ref, _ = torch_ctc(logits, lens, labels, lab_lens)
    got = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray(lens),
                              jnp.asarray(labels), jnp.asarray(lab_lens)))
    np.testing.assert_allclose(got, ref, rtol=1e-4)


def test_impossible_alignment_is_inf():
    logits = np.zeros((1, 3, 4), np.float32)
    labels = np.array([[1, 1, 1]], np.int32)  # needs >= 5 frames with repeats
    loss = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray([3]),
                               jnp.asarray(labels), jnp.asarray([3])))
    assert np.isinf(loss[0])


def test_perfect_alignment_low_loss():
    """Logits massively favoring the target path give near-zero loss."""
    c = 4
    path = [1, 1, 3, 2, 3]  # "1 blank 2 blank" -> labels [1, 2]
    logits = np.full((1, 5, c), -20.0, np.float32)
    for t, k in enumerate(path):
        logits[0, t, k] = 20.0
    loss = np.asarray(ctc_loss(jnp.asarray(logits), jnp.asarray([5]),
                               jnp.asarray([[1, 2]], np.int32), jnp.asarray([2])))
    assert loss[0] < 1e-3


def test_greedy_decode():
    c = 4  # blank = 3
    seq = [3, 1, 1, 3, 2, 2, 1, 3]
    logits = np.full((1, len(seq), c), -10.0, np.float32)
    for t, k in enumerate(seq):
        logits[0, t, k] = 10.0
    [(tokens, steps)] = greedy_decode(jnp.asarray(logits))
    assert tokens == [1, 2, 1]
    assert steps == [1, 4, 6]


def test_greedy_respects_length():
    c = 4
    seq = [1, 3, 2, 2]
    logits = np.full((1, len(seq), c), -10.0, np.float32)
    for t, k in enumerate(seq):
        logits[0, t, k] = 10.0
    [(tokens, _)] = greedy_decode(jnp.asarray(logits), jnp.asarray([2]))
    assert tokens == [1]


def test_collapse_edge_cases():
    assert collapse_best_path(np.array([0, 0, 0]), 3, 0) == ([], [])
    assert collapse_best_path(np.array([1, 1, 1]), 3, 0) == ([1], [0])
