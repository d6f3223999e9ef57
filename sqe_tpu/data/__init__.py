from sqe_tpu.data.corpus import (  # noqa: F401
    Chunk,
    basic_cleaning,
    chunk_text,
    load_corpus,
    read_text_file,
)
from sqe_tpu.data.tokenizer import HashingTokenizer, VocabTokenizer  # noqa: F401
