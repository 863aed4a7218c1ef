"""Deterministic generator for the 2k-row sentiment eval corpus.

The reference's PART4&5 notebook trained on Sentiment140 (reference
README.md:93); that dataset cannot be fetched in this container, so the
eval corpus is GENERATED Sentiment140-style: short social posts with
polarity 0 (negative) / 4 (positive), built from phrase grammars with
negation flips, intensifiers, typos, hashtags and neutral filler so the
held-out split shares vocabulary but not sentences with training.

Run from the repo root to (re)produce the committed fixture:

    python tests/fixtures/gen_sentiment_corpus.py

The output is byte-stable (fixed seed, no dict-order dependence).
"""

from __future__ import annotations

import json
import random
from pathlib import Path

OUT = Path(__file__).parent / "sentiment_corpus_2k.jsonl"
N_ROWS = 2000

SUBJECTS = [
    "this movie", "the new album", "my phone", "the service here", "that game",
    "the update", "monday mornings", "this coffee", "the weather today",
    "my internet provider", "the season finale", "this book", "the flight",
    "the hotel room", "my new laptop", "the concert", "traffic today",
    "the customer support", "this restaurant", "the wifi", "my team",
    "the presentation", "this playlist", "the interview", "the meeting",
]

POS_ADJ = [
    "amazing", "fantastic", "wonderful", "brilliant", "great", "lovely",
    "awesome", "excellent", "delightful", "superb", "incredible", "perfect",
    "charming", "refreshing", "outstanding", "beautiful", "impressive",
]

NEG_ADJ = [
    "terrible", "awful", "horrible", "disappointing", "dreadful", "useless",
    "annoying", "broken", "miserable", "frustrating", "painful", "boring",
    "ugly", "unbearable", "pathetic", "shoddy", "infuriating",
]

POS_VERB = [
    "love", "adore", "enjoy", "recommend", "appreciate", "cherish",
]

NEG_VERB = [
    "hate", "despise", "regret", "dread", "resent", "loathe",
]

INTENSIFIERS = ["really", "so", "absolutely", "totally", "honestly", "just", ""]

POS_TAIL = [
    "made my day", "cant stop smiling", "10/10 would do again", "best ever",
    "feeling blessed", "what a win", "so happy right now", "pure joy",
]

NEG_TAIL = [
    "ruined my day", "never again", "waste of money", "worst ever",
    "feeling defeated", "what a letdown", "so done with this", "pure misery",
]

NEUTRAL_FILLER = [
    "tbh", "ngl", "fwiw", "btw", "imo", "for real", "no cap", "lol", "",
]

HASHTAGS_POS = ["#blessed", "#winning", "#happy", "#love", ""]
HASHTAGS_NEG = ["#fail", "#ugh", "#worst", "#annoyed", ""]

# negation hard cases: surface polarity word != label
NEG_FLIPS_POS = [  # label positive despite negative token
    "not bad at all", "not terrible actually", "cant complain",
    "not the worst, actually kind of great", "no complaints whatsoever",
]
NEG_FLIPS_NEG = [  # label negative despite positive token
    "not great", "not exactly amazing", "not as good as they say",
    "supposed to be wonderful but no", "not worth the hype",
]


def _typo(rng: random.Random, word: str) -> str:
    if len(word) > 4 and rng.random() < 0.08:
        i = rng.randrange(1, len(word) - 1)
        return word[:i] + word[i] + word[i:]  # doubled letter
    return word


def _post(rng: random.Random, positive: bool) -> str:
    style = rng.randrange(6)
    subj = rng.choice(SUBJECTS)
    inten = rng.choice(INTENSIFIERS)
    filler = rng.choice(NEUTRAL_FILLER)
    if style == 0:
        adj = rng.choice(POS_ADJ if positive else NEG_ADJ)
        text = f"{subj} is {inten} {_typo(rng, adj)}".replace("  ", " ")
    elif style == 1:
        verb = rng.choice(POS_VERB if positive else NEG_VERB)
        text = f"i {inten} {verb} {subj}".replace("  ", " ")
    elif style == 2:
        tail = rng.choice(POS_TAIL if positive else NEG_TAIL)
        text = f"{subj} {tail}"
    elif style == 3:
        adj = rng.choice(POS_ADJ if positive else NEG_ADJ)
        tail = rng.choice(POS_TAIL if positive else NEG_TAIL)
        text = f"{_typo(rng, adj)} experience with {subj}, {tail}"
    elif style == 4 and rng.random() < 0.5:
        text = f"{subj}: {rng.choice(NEG_FLIPS_POS if positive else NEG_FLIPS_NEG)}"
    else:
        adj = rng.choice(POS_ADJ if positive else NEG_ADJ)
        verb = rng.choice(POS_VERB if positive else NEG_VERB)
        text = f"{verb}d how {_typo(rng, adj)} {subj} turned out"
    tag = rng.choice(HASHTAGS_POS if positive else HASHTAGS_NEG)
    if filler:
        text = f"{filler} {text}"
    if tag:
        text = f"{text} {tag}"
    return text.strip()


def main() -> None:
    rng = random.Random(20240813)
    seen: set[str] = set()
    rows = []
    while len(rows) < N_ROWS:
        positive = rng.random() < 0.5
        text = _post(rng, positive)
        if text in seen:
            continue
        seen.add(text)
        rows.append({"polarity": 4 if positive else 0, "text": text})
    with OUT.open("w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    print(f"wrote {len(rows)} rows to {OUT}")


if __name__ == "__main__":
    main()
