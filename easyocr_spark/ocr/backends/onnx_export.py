"""ONNX export for the torch backend models.

The reference ships an export script tree (easyocr/scripts, ONNX docs)
as a perf-only alternative runtime: same graphs, faster CPU inference
via onnxruntime. The engine's plug points don't change — an ONNX
session producing the same [N,2,H/2,W/2] CRAFT maps / [N,T,C] CRNN
logits slots into the same score-map/probability producer seams as the
torch modules (backends/torch_craft.py, torch_crnn.py).

UNTESTED IN THIS SANDBOX (no torch/onnx); tests importorskip. Dynamic
axes keep batch/height/width (CRAFT) and batch/width (CRNN) free, which
is what variable-size page batches need.
"""

from __future__ import annotations


def export_craft(weights_path: str | None, out_path: str) -> str:
    """Export the CRAFT detector to ONNX. Returns out_path."""
    import torch

    from .torch_craft import build_model, load_weights

    model = build_model()
    if weights_path:
        load_weights(model, weights_path)
    model.eval()
    dummy = torch.zeros(1, 3, 64, 96)
    torch.onnx.export(
        model,
        (dummy,),
        out_path,
        input_names=["image"],
        output_names=["score_maps"],
        dynamic_axes={
            "image": {0: "batch", 2: "height", 3: "width"},
            "score_maps": {0: "batch", 2: "h_half", 3: "w_half"},
        },
        opset_version=17,
    )
    return out_path


def export_crnn(weights_path: str | None, out_path: str) -> str:
    """Export the gen2 CRNN recognizer to ONNX. Returns out_path."""
    import torch

    from .torch_crnn import IMG_H, build_model, load_weights

    model = build_model()
    if weights_path:
        load_weights(model, weights_path)
    model.eval()
    dummy = torch.zeros(1, 1, IMG_H, 128)
    torch.onnx.export(
        model,
        (dummy,),
        out_path,
        input_names=["crop"],
        output_names=["logits"],
        dynamic_axes={
            "crop": {0: "batch", 3: "width"},
            "logits": {0: "batch", 1: "time"},
        },
        opset_version=17,
    )
    return out_path
