from quantnet.serve.server import InferenceEngine  # noqa: F401
