"""Stark hash & sign CLI — drop-in equivalent of the reference stark_cli.

Parity: /root/reference/src/services/perpetual/public/stark_cli.py:24-186.
  -m hash        -o <oracle hex> -a <asset hex> -p <price hex> -t <time hex>
  -m sign        -k <priv hex> -d <data hex>
  -m get_public  -k <priv hex>
"""

import sys
import traceback
from argparse import ArgumentParser, RawTextHelpFormatter

from stark_perpetual_tpu.crypto.signature import private_to_stark_key, sign
from stark_perpetual_tpu.params import FIELD_PRIME
from stark_perpetual_tpu.public.perpetual_messages import get_price_msg


class HexedBoundedParam:
    def __init__(self, bound):
        self.bound = bound

    def __call__(self, input_element):
        num = int(input_element, 16)
        assert num < self.bound
        return num


def sign_cli(key, data):
    r, s = sign(data, key)
    return " ".join([hex(r), hex(s)])


def public_cli(key):
    return hex(private_to_stark_key(key))


def hash_price(oracle_name, asset_pair, price, timestamp):
    return hex(get_price_msg(oracle_name, asset_pair, timestamp, price))[2:]


DESCRIPTION = """
Starkware hash&sign cli, provides hash and sign functions.

Sign: private key + data (both hex, < FIELD_PRIME) -> Stark signature.
Hash: oracle (40-bit) + asset pair (128-bit) + price (120-bit) +
      timestamp (32-bit) -> signable price message.
"""


def main(argv=None):
    def hash_main(args, unknown):
        parser = ArgumentParser()
        parser.add_argument("-a", "--asset", required=True, dest="asset",
                            help="The asset pair", type=HexedBoundedParam(2**128))
        parser.add_argument("-o", "--oracle", required=True, dest="oracle",
                            help="The signing oracle", type=HexedBoundedParam(2**40))
        parser.add_argument("-p", "--price", required=True, dest="price",
                            help="The asset price", type=HexedBoundedParam(2**120))
        parser.add_argument("-t", "--time", required=True, dest="time",
                            help="The asset time", type=HexedBoundedParam(2**32))
        parser.parse_args(unknown, namespace=args)
        return hash_price(args.oracle, args.asset, args.price, args.time)

    def sign_main(args, unknown):
        parser = ArgumentParser()
        parser.add_argument("-k", "--key", required=True, dest="key",
                            help="The private key (hex string)",
                            type=HexedBoundedParam(FIELD_PRIME))
        parser.add_argument("-d", "--data", required=True, dest="data",
                            help="The data to sign", type=HexedBoundedParam(FIELD_PRIME))
        parser.parse_args(unknown, namespace=args)
        return sign_cli(args.key, args.data)

    def public_main(args, unknown):
        parser = ArgumentParser()
        parser.add_argument("-k", "--key", required=True, dest="key",
                            help="The private key (hex string)",
                            type=HexedBoundedParam(FIELD_PRIME))
        parser.parse_args(unknown, namespace=args)
        return public_cli(args.key)

    subparsers = {
        "hash": hash_main,
        "sign": sign_main,
        "get_public": public_main,
    }

    parser = ArgumentParser(description=DESCRIPTION, formatter_class=RawTextHelpFormatter)
    parser.add_argument("-m", "--method", required=True, dest="method",
                        help="The required operation - hash or sign",
                        choices=subparsers.keys())

    args, unknown = parser.parse_known_args(argv)
    try:
        result = subparsers[args.method](args, unknown)
        print(result)
        return 0
    except Exception:
        print(f'Got an error while processing "{args.method}":', file=sys.stderr)
        traceback.print_exc()
        print(file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
