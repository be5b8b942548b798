def __getattr__(name):
    class _Stub:
        def __init__(self, *a, **k): pass
    _Stub.__name__ = name
    return _Stub
