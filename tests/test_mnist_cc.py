"""MNIST CC alternation tests — the cleanest regression test of the
competitive-collaboration E/M logic (SURVEY.md §3.5)."""
import numpy as np
import jax
import jax.numpy as jnp

from cc_tpu.mnist import (
    MnistConfig, init_mnist_state, make_compete_step, make_collaborate_step,
    evaluate,
)


def synth_batch(b=64, seed=0):
    r = np.random.RandomState(seed)
    target = r.randint(0, 10, size=b)
    img = r.rand(b, 28, 28, 1).astype(np.float32) * 0.1
    # class-dependent signal so the task is learnable
    for i, t in enumerate(target):
        img[i, t:t + 8, t:t + 8, 0] += 1.0
    return jnp.asarray(img), jnp.asarray(target)


def leaves_delta(a, b):
    return max(float(jnp.abs(x - y).max()) for x, y in zip(
        jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))


def test_compete_trains_classifiers():
    cfg = MnistConfig(lr=1e-3)
    state = init_mnist_state(cfg, jax.random.PRNGKey(0))
    step = make_compete_step(cfg)
    img, target = synth_batch()
    losses = []
    for _ in range(10):
        state, m = step(state, img, target)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_collaborate_trains_only_moderator():
    cfg = MnistConfig(lr=1e-3)
    state = init_mnist_state(cfg, jax.random.PRNGKey(0))
    step = make_collaborate_step(cfg)
    img, target = synth_batch()
    new_state, m = step(state, img, target)
    assert leaves_delta(state.params["alice"],
                        new_state.params["alice"]) == 0
    assert leaves_delta(state.params["bob"], new_state.params["bob"]) == 0
    assert leaves_delta(state.params["mod"], new_state.params["mod"]) > 0
    assert np.isfinite(float(m["loss"]))


def test_alternation_improves_accuracy():
    cfg = MnistConfig(lr=2e-3)
    state = init_mnist_state(cfg, jax.random.PRNGKey(1))
    compete = make_compete_step(cfg)
    collaborate = make_collaborate_step(cfg)
    img, target = synth_batch(128)

    errors0, _ = evaluate(state.params, [(np.asarray(img),
                                          np.asarray(target))])
    for epoch in range(6):
        step = compete if epoch % 2 == 0 else collaborate
        for _ in range(5):
            state, _ = step(state, img, target)
    errors1, names = evaluate(state.params, [(np.asarray(img),
                                              np.asarray(target))])
    assert names[0] == "Total loss"
    assert errors1[0] < errors0[0]


def test_fix_alice_trains_bob_only():
    cfg = MnistConfig(lr=1e-3, fix_alice=True)
    state = init_mnist_state(cfg, jax.random.PRNGKey(0))
    step = make_compete_step(cfg)
    img, target = synth_batch()
    new_state, _ = step(state, img, target)
    assert leaves_delta(state.params["alice"],
                        new_state.params["alice"]) == 0
    assert leaves_delta(state.params["bob"], new_state.params["bob"]) > 0


def test_load_svhn_matches_reference_transform(tmp_path):
    """Reference pipeline is Resize(28, PIL bilinear) THEN Grayscale
    (mnist.py:151-153); check the loader against that op order computed
    independently, plus the 10->0 label remap."""
    import numpy as np
    from scipy.io import savemat
    from PIL import Image
    from cc_tpu.mnist.data import load_svhn

    r = np.random.RandomState(0)
    x = (r.rand(32, 32, 3, 5) * 255).astype(np.uint8)
    y = np.array([[1], [10], [3], [10], [7]], dtype=np.uint8)
    savemat(tmp_path / "train_32x32.mat", {"X": x, "y": y})

    imgs, labels = load_svhn(str(tmp_path), train=True)
    assert imgs.shape == (5, 28, 28, 1) and imgs.dtype == np.float32
    np.testing.assert_array_equal(labels, [1, 0, 3, 0, 7])
    want = np.asarray(
        Image.fromarray(x[..., 2], "RGB").resize((28, 28), Image.BILINEAR)
        .convert("L"), np.float32) / 255.0
    np.testing.assert_array_equal(imgs[2, ..., 0], want)
    assert 0.0 <= imgs.min() and imgs.max() <= 1.0
