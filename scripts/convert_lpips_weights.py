"""Convert pretrained LPIPS weights (VGG16 or AlexNet) to the manus_tpu
npz format.

Run this wherever torchvision + lpips are installed (they are not in the
training image):

    python scripts/convert_lpips_weights.py lpips_vgg.npz vgg
    python scripts/convert_lpips_weights.py lpips_alex.npz alex

then point the trainer at them: loss.lpips_weights (VGG, training loss)
and loss.lpips_eval_weights (AlexNet, the reference's val/test metric —
/root/reference/src/utils/loss_utils.py:17-19). Keys follow
manus_tpu/train/lpips.py: conv{stage}_{layer}_w [kh,kw,Cin,Cout] (HWIO),
conv{stage}_{layer}_b [Cout], lin{stage}_w [Cout].
"""
import sys

import numpy as np


def main(out_path: str, net: str = "vgg"):
    import lpips  # type: ignore
    import torch

    assert net in ("vgg", "alex"), net
    model = lpips.LPIPS(net=net)
    feats = model.net.slice1, model.net.slice2, model.net.slice3, \
        model.net.slice4, model.net.slice5
    out = {}
    stage_layer = []
    for si, block in enumerate(feats):
        li = 0
        for mod in block:
            if isinstance(mod, torch.nn.Conv2d):
                w = mod.weight.detach().numpy()  # [Cout, Cin, kh, kw]
                out[f"conv{si}_{li}_w"] = w.transpose(2, 3, 1, 0)  # HWIO
                out[f"conv{si}_{li}_b"] = mod.bias.detach().numpy()
                li += 1
        stage_layer.append(li)
    for k, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy()  # [1, C, 1, 1]
        out[f"lin{k}_w"] = w.reshape(-1)
    np.savez_compressed(out_path, **out)
    print(f"wrote {out_path} ({net}): stages {stage_layer}")


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "lpips_vgg.npz",
        sys.argv[2] if len(sys.argv) > 2 else "vgg",
    )
