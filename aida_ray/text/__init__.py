from aida_ray.text.tokenizer import tokenize, conflate_token, normalize_whitespace  # noqa: F401
from aida_ray.text.extract import extract_text, wrap_text_as_html  # noqa: F401
