"""Recorded state_dict layouts of the published EasyOCR checkpoints.

Torch is absent from this sandbox, so the torch backends
(torch_craft.py / torch_crnn.py) can never load their real weights
here. These manifests pin the PUBLIC layout of the two checkpoints the
backends target — key names and tensor shapes — so an in-sandbox test
can prove that ``remap_key`` maps every checkpoint key injectively onto
a module parameter of the same shape (a wrong remap becomes a test
failure instead of a production KeyError / size-mismatch).

Sources (public):
- ``craft_mlt_25k.pth``: reference easyocr/config.py:11-16 (file +
  md5); architecture clovaai/CRAFT-pytorch craft.py + basenet/
  vgg16_bn.py — slices keep torchvision ``vgg16_bn.features`` indices
  as submodule names, so parameterful indices are sparse. Saved from a
  DataParallel wrapper: every key carries the ``module.`` prefix.
- ``english_g2.pth``: reference easyocr/config.py:145-160; architecture
  easyocr/model/vgg_model.py:4-35 + model/modules.py:81-130
  (VGG_FeatureExtractor with output_channel=256, two
  BidirectionalLSTM(256,256,256), Linear head, 96-char charset ->
  num_class 97 with the CTC blank). Also ``module.``-prefixed
  (reference easyocr/recognition.py:182-186 strips it on CPU).

The tables below are LITERAL records of those layouts (channel
progressions written out, not derived from the backends' own configs)
so the test is an independent cross-check, not a tautology. BatchNorm
entries include the ``num_batches_tracked`` buffer (scalar, shape ())
that torch >= 0.4.1 checkpoints carry.
"""

from __future__ import annotations

Shape = tuple[int, ...]


def _conv(prefix: str, out_ch: int, in_ch: int, k: int,
          bias: bool = True) -> dict[str, Shape]:
    d: dict[str, Shape] = {f"{prefix}.weight": (out_ch, in_ch, k, k)}
    if bias:
        d[f"{prefix}.bias"] = (out_ch,)
    return d


def _bn(prefix: str, ch: int) -> dict[str, Shape]:
    return {
        f"{prefix}.weight": (ch,),
        f"{prefix}.bias": (ch,),
        f"{prefix}.running_mean": (ch,),
        f"{prefix}.running_var": (ch,),
        f"{prefix}.num_batches_tracked": (),
    }


def craft_checkpoint_manifest() -> dict[str, Shape]:
    """Key -> shape for craft_mlt_25k.pth (module.-prefixed)."""
    m: dict[str, Shape] = {}
    # basenet slices: (slice, torchvision feature index, kind, channels)
    # — indices are the ORIGINAL vgg16_bn.features positions, kept by
    # CRAFT's add_module(str(x), ...) loop.
    vgg = [
        (1, 0, 3, 64), (1, 3, 64, 64), (1, 7, 64, 128), (1, 10, 128, 128),
        (2, 14, 128, 256), (2, 17, 256, 256),
        (3, 20, 256, 256), (3, 24, 256, 512), (3, 27, 512, 512),
        (4, 30, 512, 512), (4, 34, 512, 512), (4, 37, 512, 512),
    ]
    for s, idx, c_in, c_out in vgg:
        m.update(_conv(f"basenet.slice{s}.{idx}", c_out, c_in, 3))
        m.update(_bn(f"basenet.slice{s}.{idx + 1}", c_out))
    # slice5 = fc6 (dilated 3x3) / fc7 (1x1) neck after a stride-1 pool
    m.update(_conv("basenet.slice5.1", 1024, 512, 3))
    m.update(_conv("basenet.slice5.2", 1024, 1024, 1))
    # upconvN = double_conv(in, mid, out): 1x1 squeeze + BN, 3x3 + BN
    for i, (c_in, c_mid, c_out) in enumerate(
        [(1024, 512, 256), (512, 256, 128), (256, 128, 64), (128, 64, 32)],
        start=1,
    ):
        m.update(_conv(f"upconv{i}.conv.0", c_mid, c_in + c_mid, 1))
        m.update(_bn(f"upconv{i}.conv.1", c_mid))
        m.update(_conv(f"upconv{i}.conv.3", c_out, c_mid, 3))
        m.update(_bn(f"upconv{i}.conv.4", c_out))
    # conv_cls score head -> 2 channels (region, affinity)
    m.update(_conv("conv_cls.0", 32, 32, 3))
    m.update(_conv("conv_cls.2", 32, 32, 3))
    m.update(_conv("conv_cls.4", 16, 32, 3))
    m.update(_conv("conv_cls.6", 16, 16, 1))
    m.update(_conv("conv_cls.8", 2, 16, 1))
    return {f"module.{k}": v for k, v in m.items()}


def _lstm(prefix: str, n_in: int, n_hidden: int) -> dict[str, Shape]:
    d: dict[str, Shape] = {}
    for suffix in ("", "_reverse"):
        d[f"{prefix}.weight_ih_l0{suffix}"] = (4 * n_hidden, n_in)
        d[f"{prefix}.weight_hh_l0{suffix}"] = (4 * n_hidden, n_hidden)
        d[f"{prefix}.bias_ih_l0{suffix}"] = (4 * n_hidden,)
        d[f"{prefix}.bias_hh_l0{suffix}"] = (4 * n_hidden,)
    return d


def english_g2_checkpoint_manifest() -> dict[str, Shape]:
    """Key -> shape for english_g2.pth (module.-prefixed)."""
    m: dict[str, Shape] = {}
    fe = "FeatureExtraction.ConvNet"
    m.update(_conv(f"{fe}.0", 32, 1, 3))
    m.update(_conv(f"{fe}.3", 64, 32, 3))
    m.update(_conv(f"{fe}.6", 128, 64, 3))
    m.update(_conv(f"{fe}.8", 128, 128, 3))
    m.update(_conv(f"{fe}.11", 256, 128, 3, bias=False))
    m.update(_bn(f"{fe}.12", 256))
    m.update(_conv(f"{fe}.14", 256, 256, 3, bias=False))
    m.update(_bn(f"{fe}.15", 256))
    m.update(_conv(f"{fe}.18", 256, 256, 2))
    for i in range(2):
        m.update(_lstm(f"SequenceModeling.{i}.rnn", 256, 256))
        m[f"SequenceModeling.{i}.linear.weight"] = (256, 512)
        m[f"SequenceModeling.{i}.linear.bias"] = (256,)
    m["Prediction.weight"] = (97, 256)
    m["Prediction.bias"] = (97,)
    return {f"module.{k}": v for k, v in m.items()}


def gen1_checkpoint_manifest(num_class: int) -> dict[str, Shape]:
    """Key -> shape for the gen1 ResNet checkpoints (thai.pth,
    arabic.pth, ... — reference easyocr/config.py:55-143; architecture
    easyocr/model/model.py:4-35 + model/modules.py:126-264). All gen1
    models share one graph (input_channel 1, output_channel 512,
    hidden_size 512, BasicBlock counts [1, 2, 5, 3]) and differ only in
    the head's num_class. ResNet convs are all bias-free; a BasicBlock
    carries a 1x1 downsample projection only where its input channel
    count changes (the first block of layers 1-3; layer4 is 512->512)."""
    m: dict[str, Shape] = {}
    fe = "FeatureExtraction.ConvNet"
    m.update(_conv(f"{fe}.conv0_1", 32, 1, 3, bias=False))
    m.update(_bn(f"{fe}.bn0_1", 32))
    m.update(_conv(f"{fe}.conv0_2", 64, 32, 3, bias=False))
    m.update(_bn(f"{fe}.bn0_2", 64))
    stages = [  # (layer, blocks, c_in, c_out)
        (1, 1, 64, 128), (2, 2, 128, 256), (3, 5, 256, 512), (4, 3, 512, 512),
    ]
    for layer, blocks, c_in, c_out in stages:
        for b in range(blocks):
            ci = c_in if b == 0 else c_out
            pre = f"{fe}.layer{layer}.{b}"
            m.update(_conv(f"{pre}.conv1", c_out, ci, 3, bias=False))
            m.update(_bn(f"{pre}.bn1", c_out))
            m.update(_conv(f"{pre}.conv2", c_out, c_out, 3, bias=False))
            m.update(_bn(f"{pre}.bn2", c_out))
            if ci != c_out:
                m.update(_conv(f"{pre}.downsample.0", c_out, ci, 1, bias=False))
                m.update(_bn(f"{pre}.downsample.1", c_out))
        if layer <= 3:
            m.update(_conv(f"{fe}.conv{layer}", c_out, c_out, 3, bias=False))
            m.update(_bn(f"{fe}.bn{layer}", c_out))
    m.update(_conv(f"{fe}.conv4_1", 512, 512, 2, bias=False))
    m.update(_bn(f"{fe}.bn4_1", 512))
    m.update(_conv(f"{fe}.conv4_2", 512, 512, 2, bias=False))
    m.update(_bn(f"{fe}.bn4_2", 512))
    for i in range(2):
        m.update(_lstm(f"SequenceModeling.{i}.rnn", 512, 512))
        m[f"SequenceModeling.{i}.linear.weight"] = (512, 1024)
        m[f"SequenceModeling.{i}.linear.bias"] = (512,)
    m["Prediction.weight"] = (num_class, 512)
    m["Prediction.bias"] = (num_class,)
    return {f"module.{k}": v for k, v in m.items()}
