"""LeNet for the MNIST CC demo (parity: mnist.py:83-102), NHWC."""
from __future__ import annotations

import flax.linen as nn


class LeNet(nn.Module):
    nout: int = 10

    @nn.compact
    def __call__(self, x):
        # x: [B, 28, 28, 1]; VALID convs + 2x2 maxpool like the torch net
        x = nn.relu(nn.Conv(40, (3, 3), padding="VALID")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.relu(nn.Conv(40, (3, 3), padding="VALID")(x))
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)  # 5*5*40
        x = nn.relu(nn.Dense(40)(x))
        return nn.Dense(self.nout)(x)
