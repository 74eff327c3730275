"""``python -m icee_tpu.serve`` — run the caption demo server.

Same contract as the reference's ``python app/backend/run.py`` (Flask dev
server, ``app/backend/run.py:63-65``): serves ``POST /generate?mode=`` +
``GET /images/<f>`` and the bundled SPA at ``/``.
"""
from icee_tpu.serve.app import main

if __name__ == "__main__":
    main()
