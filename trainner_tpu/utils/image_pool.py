"""Fake-image replay buffer for i2i GAN training.

Equivalent of ref codes/utils/image_pool.py:5 (ImagePool): with probability
0.5 a queried fake is swapped with a stored past fake, stabilizing D.
Host-side numpy buffer (the pool is inherently sequential state; keeping it
off-device avoids threading a growing buffer through the jitted step —
the swap happens between the G step and the D step on host arrays).
"""

from __future__ import annotations


import numpy as np


class ImagePool:
    def __init__(self, pool_size: int = 50, seed: int = 0):
        self.pool_size = pool_size
        self.images: list[np.ndarray] = []
        self.rng = np.random.default_rng(seed)

    def query(self, images: np.ndarray) -> np.ndarray:
        """images: (b, h, w, c) batch of freshly generated fakes."""
        if self.pool_size <= 0:
            return images
        out = []
        for img in np.asarray(images):
            if len(self.images) < self.pool_size:
                self.images.append(img.copy())
                out.append(img)
            elif self.rng.random() > 0.5:
                idx = int(self.rng.integers(0, self.pool_size))
                out.append(self.images[idx].copy())
                self.images[idx] = img.copy()
            else:
                out.append(img)
        return np.stack(out)
