"""``ibis.selectors`` stub (imported as ``s`` at reference load_data.py:6)."""


def __getattr__(name):  # any selector use fails loudly at call time
    raise RuntimeError(
        f"ibis.selectors.{name} used inside the parity harness"
    )
