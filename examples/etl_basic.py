"""Classic PipeFlow-style ETL, Ray-Data-native.

The reference's canonical chain (README.md:30-38 of /root/reference):

    PipeFlow.From.Csv("input.csv")
        .Filter(row => row["age"] > 25)
        .Map(row => { row["name"] = row["name"].ToUpper(); return row; })
        .ToCsv("output.csv")

translated to this engine — vectorized batches instead of per-row lambdas.

Run: PYTHONPATH=/root/repo python examples/etl_basic.py
"""

import pyarrow.compute as pc
from pyarrow.dataset import field

import ray

from pipeflow_ray import Pipeline


def main():
    import tempfile, os

    tmp = tempfile.mkdtemp(prefix="pipeflow_example_")
    src = os.path.join(tmp, "input.csv")
    with open(src, "w") as f:
        f.write("name,age,city\nalice,30,london\nbob,22,paris\ncarol,41,tokyo\n")

    out_dir = os.path.join(tmp, "out")
    (
        Pipeline.from_csv(src)
        .filter(field("age") > 25)
        .map(lambda t: t.set_column(t.column_names.index("name"), "name",
                                    pc.utf8_upper(t["name"])))
        .to_csv(out_dir)
    )
    print("rows out:", Pipeline.from_csv(out_dir + "/").count())
    for row in Pipeline.from_csv(out_dir + "/").to_list():
        print(row)


if __name__ == "__main__":
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
    main()
    ray.shutdown()
