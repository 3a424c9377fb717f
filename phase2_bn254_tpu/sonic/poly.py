"""S(X, Y) partial-evaluation backends.

s(X, Y) = sum_i u_i(Y) X^{-i} + v_i(Y) X^{i} + w_i(Y) X^{i+N}, with
u_i(Y) = sum_q Y^{q+N} u_{q,i}, v_i likewise, and
w_i(Y) = -Y^i - Y^{-i} + sum_q Y^{q+N} w_{q,i}.

`SxEval` fixes Y=y and accumulates the X coefficient vectors; `SyEval`
fixes X=x and accumulates the Y coefficient vectors. Both are synthesis
backends - they observe insert_coefficient events and add coeff * (power)
into the right vector. Mirrors
/root/reference/bellman/src/sonic/helped/poly.rs.
"""

from __future__ import annotations

from .cs import Backend, Variable
from ..refimpl.field import R_MOD


def _powers(first: int, base: int, num: int) -> list[int]:
    out, cur = [], first % R_MOD
    for _ in range(num):
        out.append(cur)
        cur = cur * base % R_MOD
    return out


def evaluate_at_consecutive_powers(coeffs, first: int, base: int) -> int:
    """sum_i coeffs[i] * first * base^i (util.rs:151-200)."""
    acc, cur = 0, first % R_MOD
    for c in coeffs:
        acc = (acc + c * cur) % R_MOD
        cur = cur * base % R_MOD
    return acc


class SxEval(Backend):
    """Evaluate s(X, y): poly.rs:22-165.

    After synthesis, `poly()` returns (negative, positive) X-coefficient
    vectors: negative = [u_1..u_N] (coeffs of X^-1..X^-N), positive =
    [v_1..v_N, w_1..w_N] (coeffs of X^1..X^2N)."""

    def __init__(self, y: int, n: int):
        self.y = y % R_MOD
        self.yqn = pow(self.y, n, R_MOD)  # current y^{q+N}
        self.u = [0] * n
        self.v = [0] * n
        y_inv = pow(self.y, -1, R_MOD)
        # w_i starts at -y^i - y^{-i}
        yp = _powers(self.y, self.y, n)
        yn = _powers(y_inv, y_inv, n)
        self.w = [(-a - b) % R_MOD for a, b in zip(yp, yn)]
        self.max_n = n

    def poly(self) -> tuple[list[int], list[int]]:
        return self.u, self.v + self.w

    def finalize(self, x: int) -> int:
        x_inv = pow(x, -1, R_MOD)
        acc = evaluate_at_consecutive_powers(self.u, x_inv, x_inv)
        acc += evaluate_at_consecutive_powers(self.v, x, x)
        xn1 = pow(x, len(self.v) + 1, R_MOD)
        acc += evaluate_at_consecutive_powers(self.w, xn1, x)
        return acc % R_MOD

    # -- Backend ------------------------------------------------------------

    def new_linear_constraint(self):
        self.yqn = self.yqn * self.y % R_MOD
        return self.yqn

    def get_for_q(self, q: int):
        return pow(self.y, self.max_n + q, R_MOD)

    def insert_coefficient(self, var: Variable, coeff: int, y) -> None:
        vec = {"A": self.u, "B": self.v, "C": self.w}[var.kind]
        vec[var.index - 1] = (vec[var.index - 1] + coeff * y) % R_MOD


class SyEval(Backend):
    """Evaluate s(x, Y): poly.rs:167-322.

    `poly()` returns (negative, positive) Y-coefficient vectors: negative =
    coeffs of Y^-1..Y^-N, positive = coeffs of Y^1..Y^{N+Q}."""

    def __init__(self, x: int, n: int, q: int):
        x = x % R_MOD
        x_inv = pow(x, -1, R_MOD)
        self.a = _powers(x_inv, x_inv, n)  # x^{-1}..x^{-N}
        self.b = _powers(x, x, n)  # x^1..x^N
        xn1 = pow(x, n + 1, R_MOD)
        self.c = _powers(xn1, x, n)  # x^{N+1}..x^{2N}
        # -sum_i Y^i X^{i+N} and -sum_i Y^-i X^{i+N}
        neg_c = [(-v) % R_MOD for v in self.c]
        self.positive_coeffs = neg_c + [0] * q
        self.negative_coeffs = list(neg_c)
        self.current_q = 0
        self.max_n = n

    def poly(self) -> tuple[list[int], list[int]]:
        return self.negative_coeffs, self.positive_coeffs

    def finalize(self, y: int) -> int:
        y_inv = pow(y, -1, R_MOD)
        acc = evaluate_at_consecutive_powers(self.positive_coeffs, y, y)
        acc += evaluate_at_consecutive_powers(self.negative_coeffs, y_inv, y_inv)
        return acc % R_MOD

    # -- Backend ------------------------------------------------------------

    def new_linear_constraint(self):
        self.current_q += 1
        return self.current_q

    def get_for_q(self, q: int):
        return q

    def insert_coefficient(self, var: Variable, coeff: int, q) -> None:
        x_pow = {"A": self.a, "B": self.b, "C": self.c}[var.kind][var.index - 1]
        yindex = q + self.max_n
        self.positive_coeffs[yindex - 1] = (
            self.positive_coeffs[yindex - 1] + coeff * x_pow
        ) % R_MOD
