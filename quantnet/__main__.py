from quantnet.cli.main import main

if __name__ == "__main__":
    main()
