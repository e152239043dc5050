"""Command-line entry points (installed as ``hpvaegan-*`` console scripts).

Each module mirrors one reference entry point (SURVEY.md §2.1) and is also
importable/runnable through the thin repo-root shims (``train_image.py``
etc.) for flag-for-flag compatibility with the reference invocation style.
Modules are imported lazily by the shims / console scripts — importing this
package does not pull in any trainer.
"""
