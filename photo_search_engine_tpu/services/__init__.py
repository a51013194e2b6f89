"""Host-side services: LLM-backed planners/analyzers plus deterministic
local backends so the full stack runs offline (reference pattern:
utils/vision_llm_service.py LocalVisionLLMService, tests/helpers.py fakes).
"""
