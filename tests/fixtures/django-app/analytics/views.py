"""Django reporting views (plane-class app slice).

The QuerySet aggregate sites below must be FOUND by the scanner
(the reference scanner's INCLUDE semantics applied to .py files);
their emission is a documented loud failure — the model's db_table
is not visible in the chain.
"""

from django.db import connection
from django.db.models import Avg, Count, Q, Sum

from .models import Expense


def category_breakdown(request):
    stats = (
        Expense.objects.values("category")
        .annotate(total=Sum("amount"), n=Count("id"))
        .order_by("-total")
    )
    return list(stats)


def overall_stats(request):
    return Expense.objects.aggregate(
        total=Sum("amount"), avg=Avg("amount"), n=Count("id")
    )


def monthly_report_raw(request):
    with connection.cursor() as cur:
        cur.execute(
            "SELECT DATE_TRUNC('month', date) AS month, SUM(amount) AS total"
            " FROM expenses WHERE 1=1 GROUP BY 1 ORDER BY 1"
        )
        return cur.fetchall()


def get_expense(request, pk):
    # single-row lookup: NOT analytical (EXCLUDE rule)
    return Expense.objects.get(pk=pk)


def paid_category_breakdown(request):
    # filtered rollup: simple lookups translate into the WHERE 1=1 arm
    stats = (
        Expense.objects.filter(category__in=["Food", "Travel"], amount__gte=5)
        .exclude(amount__gte=240)
        .values("category")
        .annotate(total=Sum("amount"), n=Count("id"))
        .order_by("category")
    )
    return list(stats)


def flagged_breakdown(request):
    # flat Q tree + text lookup: OR of literal lookups (r16)
    stats = (
        Expense.objects.filter(
            Q(category__icontains="foo") | Q(amount__gte=200),
            amount__lt=240,
        )
        .values("category")
        .annotate(total=Sum("amount"), n=Count("id"))
        .order_by("category")
    )
    return list(stats)


def non_food_breakdown(request):
    # exclude on a NULLABLE column: Django KEEPS NULL-category rows
    stats = (
        Expense.objects.exclude(category="Food")
        .values("category")
        .annotate(total=Sum("amount"), n=Count("id"))
        .order_by("category")
    )
    return list(stats)


def repeated_categories(request):
    # the dedup idiom: filter AFTER annotate compiles to HAVING
    stats = (
        Expense.objects.values("category")
        .annotate(n=Count("id"), total=Sum("amount"))
        .filter(n__gt=37)
        .order_by("category")
    )
    return list(stats)
