from .keccak import keccak256, keccak256_hex, keccak256_udf
from .skeleton import extract_skeleton, skeleton_udf
from .metadata import split_metadata, decode_metadata, metadata_udf
from .ngrams import opcode_tokens, opcode_ngrams, ngram_rows

__all__ = [
    "keccak256",
    "keccak256_hex",
    "keccak256_udf",
    "extract_skeleton",
    "skeleton_udf",
    "split_metadata",
    "decode_metadata",
    "metadata_udf",
    "opcode_tokens",
    "opcode_ngrams",
    "ngram_rows",
]
