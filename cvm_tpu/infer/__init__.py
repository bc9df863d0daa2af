from cvm_tpu.infer.pipeline import InferencePipeline  # noqa: F401
