"""Prompt-contract tests for the remote LLM services.

The reference asserts prompt TEXT, not just parsed output
(tests/test_query_formatter.py:223-255 checks the rules shipped to the
model) — prompt regressions silently change planner behavior in ways
output-shape tests cannot catch.  Same strategy here: capture the
messages a remote backend sends and assert the load-bearing rules.
"""

import json
import unittest
from unittest.mock import Mock

from photo_search_engine_tpu.services.query_formatter import QueryFormatter
from photo_search_engine_tpu.services.time_parser import TimeParser


def _chat_response(text):
    return {"choices": [{"message": {"content": text}}]}


def _capturing_client(reply_json):
    calls = []

    def create(**kwargs):
        calls.append(kwargs)
        return _chat_response(reply_json)

    client = Mock()
    client.chat.completions.create = create
    return client, calls


_INTENT_REPLY = json.dumps(
    {
        "search_text": "海边 日落",
        "retrieval_mode": "hybrid",
        "media_terms": [],
        "identity_terms": [],
        "strict_identity_filter": False,
        "intent_mode": "open",
        "intent_contract": {"core_target": "海边", "must_keep": [], "avoid_drift": ""},
        "time_hint": None,
        "season": None,
        "time_period": None,
    },
    ensure_ascii=False,
)


class QueryFormatterPromptTest(unittest.TestCase):
    def _run(self):
        client, calls = _capturing_client(_INTENT_REPLY)
        service = QueryFormatter(
            backend="openai", client=client, model_name="m", max_retries=1
        )
        service.format_query("帮我找去年夏天海边日落的照片")
        self.assertEqual(len(calls), 1)
        messages = calls[0]["messages"]
        return (
            next(m["content"] for m in messages if m["role"] == "system"),
            next(m["content"] for m in messages if m["role"] == "user"),
        )

    def test_system_prompt_fixes_the_output_schema(self):
        system, _ = self._run()
        for field in (
            "search_text", "retrieval_mode", "media_terms", "identity_terms",
            "strict_identity_filter", "intent_mode", "intent_contract",
            "time_hint", "season", "time_period",
        ):
            self.assertIn(field, system)
        self.assertIn("只返回 JSON", system)

    def test_system_prompt_carries_planner_rules(self):
        system, _ = self._run()
        # visual-only search_text; identity/media separation; hybrid default
        self.assertIn("不能编造", system)
        self.assertIn("identity_terms", system)
        self.assertIn("filter_only", system)
        self.assertIn("strict", system)

    def test_user_prompt_strips_task_words_and_time(self):
        _, prompt = self._run()
        self.assertIn("礼貌词", prompt)
        self.assertIn("search_text 只保留画面内容", prompt)
        self.assertIn("帮我找去年夏天海边日落的照片", prompt)

    def test_current_date_is_injected(self):
        system, _ = self._run()
        self.assertIn("当前时间是", system)

    def test_reflection_prompt_carries_weak_results_and_no_drift(self):
        client, calls = _capturing_client("{}")
        service = QueryFormatter(
            backend="openai", client=client, model_name="m", max_retries=1
        )
        service.reflect_on_weak_results(
            "海边日落",
            {"search_text": "海边 日落"},
            [{"photo_path": "/p/1.jpg", "score": 0.2, "match_summary": {}}],
        )
        self.assertEqual(len(calls), 1)
        messages = calls[0]["messages"]
        system = next(m["content"] for m in messages if m["role"] == "system")
        prompt = next(m["content"] for m in messages if m["role"] == "user")
        self.assertIn("不得偏题", system)
        self.assertIn("contract_satisfied", system)
        self.assertIn("/p/1.jpg", prompt)
        self.assertIn("海边日落", prompt)


class TimeParserPromptTest(unittest.TestCase):
    def test_remote_prompt_rules(self):
        client, calls = _capturing_client(
            json.dumps({"has_time_constraint": False})
        )
        service = TimeParser(
            backend="openai", client=client, model_name="m", max_retries=1
        )
        service.extract_time_constraints("2023年10月的照片")
        self.assertEqual(len(calls), 1)
        prompt = calls[0]["messages"][0]["content"]
        # current-date injection + the season-words-alone-don't-make-a-range
        # rule (reference time_parser.py:160-162)
        self.assertIn("当前日期", prompt)
        self.assertIn("季节词或时段词", prompt)
        self.assertIn("不生成日期范围", prompt)
        self.assertIn("2023年10月的照片", prompt)
        self.assertIn("has_time_constraint", prompt)


if __name__ == "__main__":
    unittest.main()
