"""Tiny RealESRGAN-style x4 GGUF fixture (nf=8, nb=2)."""

import numpy as np

from llama_box_tpu.gguf.writer import GGUFWriter

NF = 8
NB = 2
GC = 4   # dense growth channels


def write_tiny_esrgan(path: str, seed: int = 0, old_arch: bool = False):
    rng = np.random.default_rng(seed)
    w = GGUFWriter(path, architecture="esrgan")

    def rand(*shape, s=0.05):
        return (rng.standard_normal(shape) * s).astype(np.float32)

    def conv(name, cout, cin):
        w.add_tensor(name + ".weight", rand(cout, cin, 3, 3))
        w.add_tensor(name + ".bias", rand(cout))

    def rdb_conv_name(n, m, k):
        if old_arch:
            return f"model.1.sub.{n}.RDB{m}.conv{k}.0"
        return f"body.{n}.rdb{m}.conv{k}"

    conv("model.0" if old_arch else "conv_first", NF, 3)
    for n in range(NB):
        for m in (1, 2, 3):
            for k in range(1, 5):
                conv(rdb_conv_name(n, m, k), GC, NF + (k - 1) * GC)
            conv(rdb_conv_name(n, m, 5), NF, NF + 4 * GC)
    conv("model.1.sub.23" if old_arch else "conv_body", NF, NF)
    conv("model.3" if old_arch else "conv_up1", NF, NF)
    conv("model.6" if old_arch else "conv_up2", NF, NF)
    conv("model.8" if old_arch else "conv_hr", NF, NF)
    conv("model.10" if old_arch else "conv_last", 3, NF)
    w.write()
    return path
