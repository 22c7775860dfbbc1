"""Host-side native runtime (C++ decode/resize workers — see native/).

The reference has zero native components (SURVEY.md §2: pure Python on tf.data's
C++ runtime). The native surface here accelerates the host ingest path; the Python
loader in data/loader.py is the portable fallback and the source of truth for
semantics.
"""
