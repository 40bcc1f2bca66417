"""Repr helper mixin (ref: mmdet/utils/util_mixins.py:43 NiceRepr)."""


class NiceRepr:
    """Defines ``__repr__``/``__str__`` from ``__nice__`` (falls back to
    ``__len__`` when only that is defined)."""

    def __nice__(self):
        if hasattr(self, '__len__'):
            return str(len(self))
        raise NotImplementedError(
            f'Define the __nice__ method for {self.__class__!r}')

    def __repr__(self):
        try:
            return (f'<{self.__class__.__name__}({self.__nice__()}) '
                    f'at {hex(id(self))}>')
        except NotImplementedError as ex:
            import warnings
            warnings.warn(str(ex), category=RuntimeWarning)
            return object.__repr__(self)

    def __str__(self):
        try:
            return f'<{self.__class__.__name__}({self.__nice__()})>'
        except NotImplementedError as ex:
            import warnings
            warnings.warn(str(ex), category=RuntimeWarning)
            return object.__repr__(self)
