from sqe_tpu.serving.engine import RAGEngine  # noqa: F401
from sqe_tpu.serving.generation import (  # noqa: F401
    EchoBackend,
    GenerationBackend,
    HTTPChatBackend,
    OpenAIStreamBackend,
)
