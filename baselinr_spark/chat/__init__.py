"""Chat tool surface: provider-agnostic tool registry + deterministic
intent router over the pipeline warehouse (recasts
/root/reference/baselinr/chat/{tools.py,agent.py} minus LLM calls)."""

from .tools import Tool, ToolRegistry, setup_tools  # noqa: F401
from .router import route, answer  # noqa: F401
