from . import ann_serve  # noqa: F401
from . import drift  # noqa: F401
from . import windows  # noqa: F401
