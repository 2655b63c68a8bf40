"""From-scratch ONNX interchange (no `onnx`/`onnxruntime` dependency).

The reference ships an ONNX export path (`/root/reference/ONNX/export_onnx.py:52-63`
via torch.onnx.export) so trained voices run anywhere onnxruntime does.
This package reproduces that portability story for the TPU-native rebuild:

* `proto`   — hand-encoded ONNX protobuf wire format (ModelProto et al.)
* `builder` — a tiny graph builder (nodes, initializers, dynamic dims)
* `export`  — builds the full synthesis graph (tokens, style, speed) ->
  wav from a styletts2_tpu param tree (reference ONNX/inference_onnx.py:225-261)
* `runtime` — a numpy evaluator for the op subset `export` emits, used by
  the tests to prove the graph computes the same audio as the JAX engine
  (and usable as a no-dependency CPU fallback runtime)
"""

from styletts2_tpu.onnx.export import export_onnx  # noqa: F401
