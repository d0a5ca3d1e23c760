from .api import parse_html, tokenize, decode_input
from .tokenizer import KernelError, to_code_units, to_wellformed
