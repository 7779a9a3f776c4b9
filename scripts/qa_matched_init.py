"""Export the torch quality-A/B run's EXACT step-0 initialization as a
flax SRResNet param tree (the round-4 VERDICT's decisive experiment: run
the identical 10k stream from the identical init on both frameworks, so
the only remaining variable is the per-step training math).

Replicates scripts/quality_ab_torch.py's construction byte-for-byte —
torch.manual_seed(0) -> reference SRResNet(3,3,64,16, noBN, pixelshuffle,
ref codes/models/modules/architectures/SRResNet_arch.py:16) ->
reference init_weights('kaiming', scale=0.1) (ref codes/models/
networks.py:71) — then maps it through the repo's own proven interop
(utils/torch_interop.srresnet_to_params, output-parity-gated in
tests/test_esrgan_output_parity.py) and serializes with flax.

Usage:
    python scripts/qa_matched_init.py [out.msgpack] [--seed N]
Consume with:
    python scripts/quality_ab_jax.py out.jsonl --f32 --init-from out.msgpack
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import quality_ab_common as C  # noqa: E402
from quality_ab_torch import REF, _stub_torchvision  # noqa: E402


def main(out_path: str = "/tmp/qa_torch_init.msgpack", seed: int = 0) -> None:
    import torch

    if REF not in sys.path:
        sys.path.append(REF)
    _stub_torchvision()
    import models.modules.architectures.SRResNet_arch as ref_arch
    import models.networks as ref_networks

    torch.manual_seed(seed)
    net = ref_arch.SRResNet(3, 3, 64, 16, upscale=C.SCALE, norm_type=None,
                            act_type="relu", mode="CNA",
                            upsample_mode="pixelshuffle")
    ref_networks.init_weights(net, init_type="kaiming", scale=0.1)
    sd = {k: v.numpy() for k, v in net.state_dict().items()}

    from flax import serialization

    from trainner_tpu.utils.torch_interop import srresnet_to_params

    params = srresnet_to_params(sd)
    with open(out_path, "wb") as f:
        f.write(serialization.to_bytes(params))
    n = sum(v.size for v in sd.values())
    print(f"wrote {out_path}: torch seed-{seed} SRResNet init, "
          f"{n} params")


if __name__ == "__main__":
    argv = sys.argv[1:]
    seed = 0
    if "--seed" in argv:
        i = argv.index("--seed")
        seed = int(argv[i + 1])
        del argv[i:i + 2]
    main(argv[0] if argv else "/tmp/qa_torch_init.msgpack", seed=seed)
