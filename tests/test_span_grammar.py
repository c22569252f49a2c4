"""Unit tests for the span-string grammar and timestamp formatting."""

import pytest

from mr_blip_tpu.text.span_grammar import (
    convert_to_absolute_time,
    moment_str_to_list,
    post_process,
    tal_str_to_list,
)
from mr_blip_tpu.text.timestamps import (
    find_annoying_numbers,
    find_annoying_numbers_replacement_dict,
    format_timestamps,
)


class TestPostProcess:
    def test_well_formed_passthrough(self):
        assert post_process("[[0, 1], [4, 7]]") == "[[0, 1], [4, 7]]"

    def test_truncates_at_eos(self):
        assert post_process("[[0, 1]]</s>junk") == "[[0, 1]]"

    def test_not_nested_list(self):
        assert post_process("hello") == "[[-1, -1]]"
        assert post_process("[0, 1]") == "[[-1, -1]]"

    def test_missing_comma_between_digits(self):
        assert post_process("[[0 1]]") == "[[0, 1]]"

    def test_missing_comma_between_windows(self):
        assert post_process("[[0, 1] [4, 7]]") == "[[0, 1], [4, 7]]"

    def test_double_comma(self):
        assert post_process("[[0,, 1]]") == "[[0, 1]]"

    def test_reversed_pair_swapped(self):
        assert post_process("[[7, 4]]") == "[[4, 7]]"

    def test_trailing_comma_on_window(self):
        assert post_process("[[0, 1],, [4, 7]]") == "[[0, 1], [4, 7]]"


class TestMomentStrToList:
    def test_parse(self):
        assert moment_str_to_list("[[0, 1], [4, 7]]") == [[0, 1], [4, 7]]

    def test_sentinel(self):
        assert moment_str_to_list("[[-1, -1]]") == [[-1, -1]]

    def test_malformed(self):
        assert moment_str_to_list("nonsense") == [[-1, -1]]
        assert moment_str_to_list("[[0, 1") == [[-1, -1]]

    def test_bad_sublist_replaced(self):
        assert moment_str_to_list("[[0, 1, 2], [4, 7]]") == [[-1, -1], [4, 7]]

    def test_tal_variant(self):
        assert tal_str_to_list('[[0, 1, "run"], [4, 7]]') == [[0, 1, "run"], [-1, -1, -1]]
        assert tal_str_to_list("garbage") == [[-1, -1, -1]]


class TestConvertToAbsoluteTime:
    def test_relative_integers(self):
        out = convert_to_absolute_time(["[[50, 100]]"], [30.0], "relative_integers")
        assert out == ["[[15.0, 30.0]]"]

    def test_relative_floats(self):
        out = convert_to_absolute_time(["[[0.5, 1.0]]"], [30.0], "relative_floats")
        assert out == ["[[15.0, 30.0]]"]

    def test_sentinel_passthrough(self):
        out = convert_to_absolute_time(["[[-1, -1]]"], [30.0], "relative_integers")
        assert out == ["[[-1, -1]]"]

    def test_rejects_absolute_format(self):
        with pytest.raises(AssertionError):
            convert_to_absolute_time(["[[1, 2]]"], [30.0], "seconds_integers")


class _FakeTokenizer:
    """Tokenizer where multiples of 7 under 50 are two tokens."""

    space_piece_id = 3

    def encode(self, text, add_special_tokens=False):
        n = int(text)
        if n != 0 and n % 7 == 0 and n < 50:
            return [100 + n, 100 + n]
        if n % 11 == 0 and n != 0:
            return [3, 100 + n]  # space-prefixed multi-token
        return [100 + n]


class TestAnnoyingNumbers:
    def test_find(self):
        annoying, spaced = find_annoying_numbers(_FakeTokenizer(), 50)
        assert annoying == [7, 14, 21, 28, 35, 42, 49]
        assert spaced == [11, 22, 33, 44]

    def test_replacement_prefers_larger(self):
        repl = find_annoying_numbers_replacement_dict([7, 14])
        assert repl == {7: 8, 14: 15}

    def test_replacement_contiguous_block(self):
        # (i+j) is checked before (i-j) at each distance j, so within a
        # contiguous annoying block the walk can resolve either direction:
        # 5 -> 4 (j=1 down), 6 -> 8 (j=2 up), 7 -> 8 (j=1 up).
        repl = find_annoying_numbers_replacement_dict([5, 6, 7])
        assert repl == {5: 4, 6: 8, 7: 8}


class TestFormatTimestamps:
    def test_seconds_integers(self):
        ts, durs, prompts = format_timestamps(
            "seconds_integers", [[0.4, 5.6]], [20.0], {6: 8}
        )
        assert ts == [[0, 8]]
        assert durs == [20]
        assert prompts == [">0>8>20"]

    def test_seconds_floats(self):
        ts, durs, prompts = format_timestamps("seconds_floats", [[0.456, 5.0]], [20.6])
        assert ts == [[0.46, 5.0]]
        assert prompts == ["0.46>5.0>21"]

    def test_relative_integers_truncation_quirk(self):
        # round(5.8/20, 2) = 0.29; 0.29*100 = 28.999... -> int() -> 28
        ts, durs, prompts = format_timestamps("relative_integers", [[5.8]], [20.0])
        assert ts == [[28]]
        assert prompts == ["28>20"]

    def test_relative_floats_drops_last_from_prompt(self):
        ts, durs, prompts = format_timestamps(
            "relative_floats", [[0.0, 10.0, 20.0]], [20.0]
        )
        assert prompts == ["0.0>0.5>20"]
        assert ts == [[0.0, 0.5, 1.0, 20]]

    def test_framenumbers(self):
        ts, durs, prompts = format_timestamps("framenumbers", [[1.0, 2.0, 3.0]], [30.0])
        assert ts == [[0, 1, 2]]
        assert prompts == ["0>1>2>30.0"]

    def test_invalid_format_raises(self):
        with pytest.raises(ValueError):
            format_timestamps("bogus", [[1.0]], [10.0])
