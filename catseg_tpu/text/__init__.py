from .tokenizer import ClipBPE, tokenize
from . import templates

__all__ = ["ClipBPE", "tokenize", "templates"]
