from graphqembed_tpu.oracle import torch_gqe  # noqa: F401
