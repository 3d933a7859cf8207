"""Conversation prompt templating.

Behavioral parity with reference llm/conversation.py:15-104 for the
separator styles the framework uses (vicuna_v1 TWO style is the live
path — reference pipeline.py:176-182; PLAIN backs the plain_gen
training preprocessor, reference train.py:259-346). Implementation is
fresh; only the template *strings* (system prompts, roles, separators)
are preserved since they are the model's prompt format.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import List, Optional, Tuple


class SeparatorStyle(enum.Enum):
    SINGLE = enum.auto()
    TWO = enum.auto()
    MPT = enum.auto()
    PLAIN = enum.auto()
    LLAMA_2 = enum.auto()


@dataclasses.dataclass
class Conversation:
    system: str
    roles: Tuple[str, str]
    messages: List[List[Optional[str]]]
    offset: int = 0
    sep_style: SeparatorStyle = SeparatorStyle.SINGLE
    sep: str = "###"
    sep2: Optional[str] = None
    version: str = "Unknown"

    def get_prompt(self) -> str:
        style = self.sep_style
        if style == SeparatorStyle.SINGLE:
            parts = [self.system + self.sep]
            for role, msg in self.messages:
                parts.append(f"{role}: {msg}{self.sep}" if msg else f"{role}:")
            return "".join(parts)
        if style == SeparatorStyle.TWO:
            seps = (self.sep, self.sep2)
            parts = [self.system + seps[0]]
            for i, (role, msg) in enumerate(self.messages):
                parts.append(f"{role}: {msg}{seps[i % 2]}" if msg else f"{role}:")
            return "".join(parts)
        if style == SeparatorStyle.MPT:
            parts = [self.system + self.sep]
            for role, msg in self.messages:
                parts.append(f"{role}{msg}{self.sep}" if msg else role)
            return "".join(parts)
        if style == SeparatorStyle.PLAIN:
            seps = (self.sep, self.sep2)
            parts = [self.system]
            for i, (_, msg) in enumerate(self.messages):
                parts.append(f"{msg}{seps[i % 2]}" if msg else "")
            return "".join(parts)
        if style == SeparatorStyle.LLAMA_2:
            out = ""
            for i, (role, msg) in enumerate(self.messages):
                if not msg:
                    continue
                if i == 0:
                    msg = f"<<SYS>>\n{self.system}\n<</SYS>>\n\n" + msg
                if i % 2 == 0:
                    out += f"{self.sep}[INST] {msg} [/INST]"
                else:
                    out += f" {msg} {self.sep2}"
            return out.lstrip(self.sep)
        raise ValueError(style)

    def append_message(self, role: str, message: Optional[str]):
        self.messages.append([role, message])

    def copy(self) -> "Conversation":
        return Conversation(
            system=self.system,
            roles=self.roles,
            messages=[list(m) for m in self.messages],
            offset=self.offset,
            sep_style=self.sep_style,
            sep=self.sep,
            sep2=self.sep2,
            version=self.version,
        )


conv_vicuna_v1 = Conversation(
    system=(
        "A chat between a curious user and an artificial intelligence assistant. "
        "The assistant gives helpful, detailed, and polite answers to the user's questions."
    ),
    roles=("USER", "ASSISTANT"),
    messages=[],
    sep_style=SeparatorStyle.TWO,
    sep=" ",
    sep2="</s>",
    version="v1",
)

conv_llava_plain = Conversation(
    system="",
    roles=("", ""),
    messages=[],
    sep_style=SeparatorStyle.PLAIN,
    sep="\n",
    sep2="\n",
    version="plain",
)

conv_templates = {
    "v1": conv_vicuna_v1,
    "vicuna_v1": conv_vicuna_v1,
    "plain": conv_llava_plain,
}


def default_conversation() -> Conversation:
    return conv_vicuna_v1.copy()
