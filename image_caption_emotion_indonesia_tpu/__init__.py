"""Alias package: ``image_caption_emotion_indonesia_tpu`` == ``icee_tpu``.

The framework's importable name is the short ``icee_tpu``; this alias keeps
the full reference-derived name importable.  All submodules resolve through
the alias (``image_caption_emotion_indonesia_tpu.models`` etc.).
"""

import sys as _sys

import icee_tpu as _icee

_sys.modules[__name__] = _icee
