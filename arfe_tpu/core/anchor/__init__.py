from .generator import (AnchorGenerator, LegacyAnchorGenerator,
                        PointGenerator, SSDAnchorGenerator)

__all__ = ['AnchorGenerator', 'LegacyAnchorGenerator', 'SSDAnchorGenerator',
           'PointGenerator']
