"""MNIST+SVHN CC evaluation (parity: /root/reference/mnist_eval.py):
accuracy of Alice / Bob / moderator-gated ensemble on the mixed test set.

python -m cc_tpu.cli.mnist_eval DATA --checkpoint checkpoints/EXP/mnist_best
"""
from __future__ import annotations

import argparse
import os

import numpy as np

parser = argparse.ArgumentParser(
    description="Evaluate CC Alice/Bob/Moderator",
    formatter_class=argparse.ArgumentDefaultsHelpFormatter)
parser.add_argument("data", metavar="DIR")
parser.add_argument("--checkpoint", required=True,
                    help="orbax dir saved by cc_tpu.cli.mnist")
parser.add_argument("--dataset", default="both",
                    choices=["mnist", "svhn", "both"])
parser.add_argument("-b", "--batch-size", type=int, default=64)


def main(argv=None):
    args = parser.parse_args(argv)
    import jax
    import orbax.checkpoint as ocp
    from cc_tpu.cli.mnist import load_dataset
    from cc_tpu.mnist import MnistConfig, evaluate, init_mnist_state
    from cc_tpu.mnist.data import iterate_batches

    state = init_mnist_state(MnistConfig(), jax.random.PRNGKey(0))
    restored = ocp.StandardCheckpointer().restore(
        os.path.abspath(args.checkpoint), target=jax.device_get(state))

    val_x, val_y = load_dataset(args, train=False)
    errors, names = evaluate(
        restored.params,
        iterate_batches(val_x, val_y, args.batch_size, shuffle=False,
                        drop_last=False))
    for n, e in zip(["total", "alice", "bob"], errors):
        print(f"accuracy_{n}: {1 - e:.4f} (error {e:.4f})")
    return errors


if __name__ == "__main__":
    main()
