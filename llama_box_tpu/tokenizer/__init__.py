from .tokenizer import Tokenizer, TokenType
